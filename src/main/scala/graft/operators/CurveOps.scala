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

  /** 2^53 — the largest magnitude at which every integer-valued double
    * is still exact; the dispatch bound for the exact-moment machinery.
    */
  private val Exact53 = 9007199254740992.0

  /** Order-independent EXACT sum of integer-valued products a·b, for the
    * closed-form moment aggregations. SPLIT-LONG form (every product
    * under 2^53, the common case): the product as a 64-bit long splits
    * into hi = p >> 31 and lo = p & (2^31-1), both halves accumulate as
    * codegen'd primitive long adds (exact for |p| < 2^62 and up to 2^32
    * rows per group) and recombine ONCE per group in decimal, rounding
    * to double a single time, exactly like the DuckDB oracle's
    * CAST(HUGEINT sum AS DOUBLE). This form runs SPECULATIVELY in the
    * same pass that measures the magnitudes, so products past ±9·10^18
    * (where the ANSI bigint cast would overflow outright) are mapped to
    * 0 instead of crashing — such rows only exist when the magnitude
    * probe is about to discard this pass anyway; nulls stay null (the
    * guard tests the value, so a null product falls through unchanged).
    */
  private def splitLongSum(a: Column, b: Column): Column = {
    val pd = a * b
    val p = when(abs(pd) >= lit(9.0e18), lit(0.0)).otherwise(pd)
      .cast("bigint")
    (sum(shiftright(p, 31)).cast("decimal(38,0)") * lit(2147483648L) +
      sum(p.bitwiseAND(lit(2147483647L))).cast("decimal(38,0)"))
      .cast("double")
  }

  /** The big-domain exact form (products can reach or exceed 2^53, where
    * the double multiply itself pre-rounds and past 2^63 the bigint cast
    * overflows): factors cast to decimal(19,0) BEFORE the multiply —
    * products and sums exact to 38 digits at any long-sized magnitude,
    * same single round-to-double. Paid only where the magnitude probe
    * proves exact doubles impossible.
    */
  private def decimalSum(a: Column, b: Column): Column =
    sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("double")

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
    val one = lit(1.0)
    def moments(mm: (Column, Column) => Column,
        extra: Seq[Column] = Nil): DataFrame =
      cube.df.groupBy(others: _*).agg(
        mm(x, y).as("_sxy"),
        (Seq(
          mm(when(y.isNotNull, x), one).as("_sx"),
          mm(y, one).as("_sy"),
          mm(when(y.isNotNull, x), when(y.isNotNull, x)).as("_sxx"),
          n.as("_n")) ++ extra): _*)
    def solve(agg: DataFrame): DataFrame = agg
      .withColumn("b", (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
        (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
      .withColumn("a", (col("_sy") - col("b") * col("_sx")) / col("_n"))
      .select((others :+ col("b") :+ col("a")): _*)
    if (!exactIntMoments) solve(moments((a, b) => sum(a * b)))
    else {
      // exactIntMoments (integer-valued x and y only): parallel double
      // addition goes order-dependent once sums pass 2^53 — the sf1 gate
      // measured a ~1e-13 Spark/DuckDB divergence — so the moments run
      // through the exact-sum machinery. The split-long fast path needs
      // every PRODUCT under 2^53 (beyond it the double multiply
      // pre-rounds, and past 2^63 the bigint cast overflows — an sf1
      // bench with 10^10-magnitude ids crashed here). SINGLE-PASS
      // dispatch: the split-long moments and the max magnitudes
      // aggregate together in ONE scan, the (per-series, metadata-sized)
      // result persists, and the driver probes the tiny aggregated frame
      // — no second pass over the raw series columns. Only a
      // proven-big-domain frame pays a decimal re-aggregation (and that
      // rare path is the only second scan). Split-long replaced per-row
      // decimal(38,0) accumulation, which cost +77% wall on the driver
      // bench for the same exactness.
      val spec = moments(splitLongSum, Seq(
        max(abs(x)).cast("double").as("_mx"),
        max(abs(y.cast("double"))).as("_my"))).persist()
      val r = spec.agg(max(col("_mx")), max(col("_my"))).first()
      val mx = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      val my = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      if (math.max(mx * mx, mx * my) >= Exact53) {
        spec.unpersist(false)
        solve(moments(decimalSum))
      } else solve(spec)
    }
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
    * With `exactIntMoments` (INTEGER-valued bases and values only, e.g.
    * the driver queries' ×1e4-quantized sin/cos) the nine moments run
    * through the same exact-sum machinery as [[fitLinear]] — exact
    * and order-independent at ANY row count, split-long while the
    * magnitude probe proves every product under 2^53 and decimal-exact
    * beyond. Without it (raw double bases, e.g. [[fitHarmonic]]) plain
    * double sums match the reference's scipy-in-doubles behavior. The
    * Cramer arithmetic runs in double on the per-group moments either
    * way, so both engines of the correctness gate produce bit-identical
    * parameters whenever the moments are exact.
    */
  def fitBasis2(cube: DataCube, dim: String,
      f1: Column => Column, f2: Column => Column,
      coord: Column => Column = identity,
      exactIntMoments: Boolean = false): DataFrame = {
    cube.requireDim(dim)
    val others = cube.dimColsExcept(dim)
    val x = coord(col(dim)).cast("double")
    val y = cube.value
    val s = f1(x); val t = f2(x)
    val one = lit(1.0)
    def moments(mm: (Column, Column) => Column,
        extra: Seq[Column] = Nil): DataFrame =
      cube.df.groupBy(others: _*).agg(
        count(when(y.isNotNull, 1)).cast("double").as("_n"),
        (Seq(
          mm(when(y.isNotNull, s), one).as("_ss"),
          mm(when(y.isNotNull, t), one).as("_sc"),
          mm(when(y.isNotNull, s), when(y.isNotNull, s)).as("_sss"),
          mm(when(y.isNotNull, t), when(y.isNotNull, t)).as("_scc"),
          mm(when(y.isNotNull, s), when(y.isNotNull, t)).as("_ssc"),
          mm(y, one).as("_sy"),
          mm(y, s).as("_sys"),
          mm(y, t).as("_syc")) ++ extra): _*)
    // single-pass magnitude dispatch, same scheme as [[fitLinear]]: the
    // split-long moments and the max magnitude share one scan; the probe
    // reads the persisted per-series aggregate, and only a proven-big-
    // domain frame pays the decimal re-aggregation (the rare second scan)
    val agg =
      if (!exactIntMoments) moments((a, b) => sum(a * b).cast("double"))
      else {
        val spec = moments(splitLongSum, Seq(max(greatest(abs(s), abs(t),
          abs(y.cast("double")))).cast("double").as("_mm"))).persist()
        val r = spec.agg(max(col("_mm"))).first()
        val m = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
        if (m * m >= Exact53) {
          spec.unpersist(false)
          moments(decimalSum)
        } else spec.drop("_mm")
      }
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
