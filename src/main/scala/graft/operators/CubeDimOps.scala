package graft.operators

import graft.core._
import org.apache.spark.sql.functions._

/** Cube-dimension utilities
  * (reference: openeo_processes_dask/process_implementations/cubes/general.py).
  */
object CubeDimOps {

  /** Add a size-1 labeled dimension; error if it exists
    * (reference: cubes/general.py:72-100).
    */
  def addDimension(cube: DataCube, name: String, label: Any,
      dimType: DimType = DimType.Other): DataCube = {
    require(!cube.meta.has(name), s"DimensionLabelCountMismatch: '$name' exists")
    DataCube(
      cube.df.withColumn(name, lit(label)),
      cube.meta.copy(dims = cube.meta.dims :+ CubeDim(name, dimType)))
  }

  /** Drop a dimension; the reference requires size 1
    * (reference: cubes/general.py:26-35). Validation is optional because it
    * forces a distinct-count action.
    */
  def dropDimension(cube: DataCube, name: String,
      validate: Boolean = false): DataCube = {
    cube.requireDim(name)
    if (validate) {
      val n = cube.df.select(col(name)).distinct().count()
      require(n <= 1, s"DimensionLabelCountMismatch: '$name' has $n labels")
    }
    DataCube(cube.df.drop(name), cube.meta.without(name))
  }

  /** Rename a dimension, keeping its type (reference: cubes/general.py:103-147). */
  def renameDimension(cube: DataCube, from: String, to: String): DataCube = {
    cube.requireDim(from)
    require(!cube.meta.has(to), s"DimensionExists: '$to'")
    DataCube(cube.df.withColumnRenamed(from, to), cube.meta.renamed(from, to))
  }

  /** Relabel values of a dimension via a source→target mapping
    * (reference: cubes/general.py:150-222 — we implement the enumerated
    * source/target lists; unmatched labels pass through unchanged).
    */
  def renameLabels(cube: DataCube, dimension: String,
      mapping: Map[String, String]): DataCube = {
    cube.requireDim(dimension)
    val m = map(mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    cube.withDf(_.withColumn(dimension,
      coalesce(element_at(m, col(dimension).cast("string")), col(dimension))))
  }

  /** Distinct labels of a dim, ordered (reference: cubes/general.py:59-69). */
  def dimensionLabels(cube: DataCube, dimension: String): org.apache.spark.sql.DataFrame = {
    cube.requireDim(dimension)
    cube.df.select(col(dimension).as("label")).distinct().orderBy(col("label"))
  }

  /** Drop labels (along every non-spatial dim) whose cells are all nodata
    * (reference: cubes/general.py:42-56). Implemented as a windowed
    * valid-count per label — one shuffle per trimmed dim, no driver loop.
    */
  def trimCube(cube: DataCube, dims: Seq[String]): DataCube = {
    import org.apache.spark.sql.expressions.Window
    dims.foldLeft(cube) { (c, d) =>
      c.requireDim(d)
      val w = Window.partitionBy(col(d))
      c.withDf(_.withColumn("_valid", count(c.value).over(w))
        .filter(col("_valid") > 0).drop("_valid"))
    }
  }
}
