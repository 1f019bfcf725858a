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
      coord: Column => Column = identity): DataFrame = {
    cube.requireDim(dim)
    val others = cube.dimColsExcept(dim)
    val x = coord(col(dim)).cast("double")
    val y = cube.value
    val n = count(when(y.isNotNull, 1)).cast("double")
    val sx = sum(when(y.isNotNull, x))
    val sy = sum(y)
    val sxx = sum(when(y.isNotNull, x * x))
    val sxy = sum(x * y)
    cube.df.groupBy(others: _*)
      .agg(sxy.as("_sxy"), sx.as("_sx"), sy.as("_sy"), sxx.as("_sxx"), n.as("_n"))
      .withColumn("b", (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
        (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
      .withColumn("a", (col("_sy") - col("b") * col("_sx")) / col("_n"))
      .drop("_sxy", "_sx", "_sy", "_sxx", "_n")
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
