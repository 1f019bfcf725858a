package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fit_curve / predict_curve
  * (reference: openeo_processes_dask/process_implementations/ml/curve_fitting.py).
  *
  * The reference runs scipy least-squares per pixel over collected arrays
  * (`xr.curvefit` + persist, curve_fitting.py:54-97). For models linear in
  * their parameters the normal equations collapse to closed-form moment
  * sums — a single groupBy aggregation, no per-series collection, exactly
  * reproducible. The nonlinear (sin/cos harmonic) case of the reference is
  * ALSO linear in parameters (a + b·sin + c·cos), so this covers it.
  */
object CurveOps {

  /** Fit value ≈ a + b·x per series (least squares). Returns one row per
    * series with columns `a`, `b` — the cube analogue of fit_curve's
    * `param` dimension (reference: curve_fitting.py:83-94).
    */
  def fitLinear(cube: DataCube, dim: String,
      coord: Column => Column = identity,
      exactIntMoments: Boolean = false): DataFrame = {
    cube.requireDim(dim)
    val others = cube.dimColsExcept(dim)
    val x = coord(col(dim)).cast("double")
    val y = cube.value
    val n = count(when(y.isNotNull, 1)).cast("double")
    // exactIntMoments (integer-valued x and y only): each PRODUCT is an
    // exact integer-valued double while it stays under 2^53, but at
    // large scales the SUM exceeds 2^53 and parallel double addition
    // becomes order-dependent — the sf1 gate measured a ~1e-13
    // Spark/DuckDB divergence. The exact sum runs in SPLIT-LONG form:
    // each product p (as a 64-bit long) splits into hi = p >> 31 and
    // lo = p & (2^31-1), so 0 <= lo < 2^31 and p == (hi << 31) + lo even
    // for negative p (two's complement); both halves accumulate as
    // codegen'd primitive long adds — exact and order-independent for
    // |p| < 2^62 and up to 2^32 rows per series — and the two exact sums
    // recombine ONCE per group in decimal, rounding to double a single
    // time, exactly like the DuckDB oracle's CAST(HUGEINT-exact sum AS
    // DOUBLE). This replaced per-row decimal(38,0) accumulation, which
    // cost +77% wall on the driver bench for the same exactness.
    //
    // The split-long form is only EXACT while the double multiply itself
    // is: |x·y| and x² must stay under 2^53 (beyond it the product
    // arrives pre-rounded, and past 2^63 the bigint cast overflows
    // outright — an sf1 bench with 10^10-magnitude ids crashed here). A
    // one-pass magnitude probe (two pruned-column maxes) dispatches
    // big-coordinate frames to decimal-EXACT products and sums instead:
    // factors cast to decimal(19,0) BEFORE the multiply, so every
    // product and sum is exact to 38 digits at any long-sized
    // coordinate, same single round-to-double per group.
    val bigDomain = exactIntMoments && {
      val r = cube.df
        .agg(max(abs(x)).cast("double"), max(abs(y.cast("double")))).first()
      val mx = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      val my = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      math.max(mx * mx, mx * my) >= 9007199254740992.0 // 2^53
    }
    def mm(a: Column, b: Column): Column =
      if (!exactIntMoments) sum(a * b)
      else if (bigDomain)
        sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)"))
          .cast("double")
      else {
        val p = (a * b).cast("bigint")
        (sum(shiftright(p, 31)).cast("decimal(38,0)") *
          lit(2147483648L) +
          sum(p.bitwiseAND(lit(2147483647L))).cast("decimal(38,0)"))
          .cast("double")
      }
    val one = lit(1.0)
    val sx = mm(when(y.isNotNull, x), one)
    val sy = mm(y, one)
    val sxx = mm(when(y.isNotNull, x), when(y.isNotNull, x))
    val sxy = mm(x, y)
    cube.df.groupBy(others: _*)
      .agg(sxy.as("_sxy"), sx.as("_sx"), sy.as("_sy"), sxx.as("_sxx"), n.as("_n"))
      .withColumn("b", (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
        (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
      .withColumn("a", (col("_sy") - col("b") * col("_sx")) / col("_n"))
      .drop("_sxy", "_sx", "_sy", "_sxx", "_n")
  }

  /** Fit value ≈ a + b·f1(x) + c·f2(x) per series — the 3-parameter normal
    * equations solved in closed form (Cramer) from one aggregation pass of
    * exact moment sums. This covers the reference's CANONICAL fit_curve
    * model, the per-pixel seasonal harmonic a + b·sin(ωt) + c·cos(ωt)
    * (reference: ml/curve_fitting.py:15-97 + tests/test_ml.py): the model is
    * linear in its parameters, so no iterative scipy-style solver is needed
    * and the fit is deterministic across partitionings when the basis values
    * are integer-quantized.
    *
    * Moment sums aggregate Long basis values exactly (every intermediate
    * < 2^53); the Cramer arithmetic runs in double on the already-exact
    * moments, so both engines of the correctness gate produce bit-identical
    * parameters.
    */
  def fitBasis2(cube: DataCube, dim: String,
      f1: Column => Column, f2: Column => Column,
      coord: Column => Column = identity): DataFrame = {
    cube.requireDim(dim)
    val others = cube.dimColsExcept(dim)
    val x = coord(col(dim)).cast("double")
    val y = cube.value
    val s = f1(x); val t = f2(x)
    val agg = cube.df.groupBy(others: _*).agg(
      count(when(y.isNotNull, 1)).cast("double").as("_n"),
      sum(when(y.isNotNull, s)).cast("double").as("_ss"),
      sum(when(y.isNotNull, t)).cast("double").as("_sc"),
      sum(when(y.isNotNull, s * s)).cast("double").as("_sss"),
      sum(when(y.isNotNull, t * t)).cast("double").as("_scc"),
      sum(when(y.isNotNull, s * t)).cast("double").as("_ssc"),
      sum(y).cast("double").as("_sy"),
      sum(y * s).cast("double").as("_sys"),
      sum(y * t).cast("double").as("_syc"))
    val n = col("_n"); val ss = col("_ss"); val sc = col("_sc")
    val sss = col("_sss"); val scc = col("_scc"); val ssc = col("_ssc")
    val sy = col("_sy"); val sys = col("_sys"); val syc = col("_syc")
    val det = n * (sss * scc - ssc * ssc) - ss * (ss * scc - ssc * sc) +
      sc * (ss * ssc - sss * sc)
    val da = sy * (sss * scc - ssc * ssc) - ss * (sys * scc - ssc * syc) +
      sc * (sys * ssc - sss * syc)
    val db = n * (sys * scc - ssc * syc) - sy * (ss * scc - ssc * sc) +
      sc * (ss * syc - sys * sc)
    val dc = n * (sss * syc - sys * ssc) - ss * (ss * syc - sys * sc) +
      sy * (ss * ssc - sss * sc)
    agg
      .withColumn("a", da / det)
      .withColumn("b", db / det)
      .withColumn("c", dc / det)
      .select((others :+ col("a") :+ col("b") :+ col("c")): _*)
  }

  /** The reference's harmonic model with angular frequency ω over the dim
    * coordinate (reference: tests/test_ml.py fit model).
    */
  def fitHarmonic(cube: DataCube, dim: String, omega: Double,
      coord: Column => Column = identity): DataFrame =
    fitBasis2(cube, dim, x => sin(x * omega), x => cos(x * omega), coord)

  /** Evaluate fitted a + b·f1(x) + c·f2(x) at given labels
    * (reference: curve_fitting.py:100-162).
    */
  def predictBasis2(params: DataFrame, seriesDims: Seq[String],
      labels: Seq[Double], f1: Column => Column, f2: Column => Column,
      dimName: String = "x"): DataFrame = {
    val spark = params.sparkSession
    import spark.implicits._
    val lab = labels.toDF(dimName)
    params.join(broadcast(lab))
      .withColumn("value",
        col("a") + col("b") * f1(col(dimName)) + col("c") * f2(col(dimName)))
      .select((seriesDims.map(col) :+ col(dimName) :+ col("value")): _*)
  }

  /** Evaluate a fitted a + b·x at given coordinates
    * (reference: curve_fitting.py:100-162): explode the label list against
    * the params table (broadcast — params are one row per series).
    */
  def predictLinear(params: DataFrame, seriesDims: Seq[String],
      labels: Seq[Double], dimName: String = "x"): DataFrame = {
    val spark = params.sparkSession
    import spark.implicits._
    val lab = labels.toDF(dimName)
    params.join(broadcast(lab))
      .withColumn("value", col("a") + col("b") * col(dimName))
      .select((seriesDims.map(col) :+ col(dimName) :+ col("value")): _*)
  }
}
