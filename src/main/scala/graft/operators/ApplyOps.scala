package graft.operators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** apply / apply_dimension — the element-wise and along-dimension callback
  * framework (reference: openeo_processes_dask/process_implementations/cubes/apply.py).
  */
object ApplyOps {

  /** Element-wise apply: the whole scalar callback sub-graph is one fused
    * Column expression tree — Tungsten codegen compiles it into a single
    * loop, with no per-process dispatch at all (vs the reference's
    * xr.apply_ufunc per node, reference: cubes/apply.py:24-39).
    */
  def apply(cube: DataCube, process: Column => Column): DataCube =
    cube.withDf(_.withColumn(cube.meta.valueCol, process(cube.value)))

  /** apply_dimension with a *window-class* callback (cumulative sums, ranks,
    * interpolation…): runs the callback per series over the given dim,
    * preserving cube shape (reference: cubes/apply.py:42-128, the
    * target_dimension=None branch).
    *
    * The callback receives a Window partitioned by every other dim and
    * ordered by the dim — a single shuffle keyed on the series identity.
    */
  def applyDimensionWindow(cube: DataCube, dimension: String,
      process: (Column, org.apache.spark.sql.expressions.WindowSpec) => Column): DataCube = {
    cube.requireDim(dimension)
    val others = cube.dimColsExcept(dimension)
    val w = Window.partitionBy(others: _*).orderBy(col(dimension))
    cube.withDf(_.withColumn(cube.meta.valueCol, process(cube.value, w)))
  }

  /** apply_dimension with an *array-class* callback: collects each series to
    * an array (ordered by the dim), applies an ArrayType→ArrayType Column
    * function (higher-order functions — still codegen'd), and explodes back.
    * Used for callbacks with cross-element data flow that windows can't
    * express (reference's np.apply_along_axis path).
    */
  def applyDimensionArray(cube: DataCube, dimension: String,
      process: Column => Column): DataCube = {
    cube.requireDim(dimension)
    val others = cube.meta.dimNames.filterNot(_ == dimension)
    val collected = cube.df
      .groupBy(others.map(col): _*)
      .agg(
        sort_array(collect_list(struct(col(dimension).as("_k"),
          cube.value.as("_v")))).as("_series"))
      .withColumn("_vals", expr("transform(_series, s -> s._v)"))
      .withColumn("_keys", expr("transform(_series, s -> s._k)"))
      .withColumn("_out", process(col("_vals")))
    val exploded = collected
      .select((others.map(col) :+
        arrays_zip(col("_keys"), col("_out")).as("_zip")): _*)
      .select((others.map(col) :+ explode(col("_zip")).as("_cell")): _*)
      .select((others.map(col) :+
        col("_cell._keys").as(dimension) :+
        col("_cell._out").as(cube.meta.valueCol)): _*)
    cube.copy(df = exploded)
  }
}
