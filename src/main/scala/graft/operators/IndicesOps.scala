package graft.operators

import graft.core._
import org.apache.spark.sql.functions._

/** Band-math indices (reference: openeo_processes_dask/process_implementations/
  * cubes/indices.py:15-59 — ndvi).
  */
object IndicesOps {

  /** ndvi = (nir - red) / (nir + red), resolving bands by label. The band
    * dimension collapses: one conditional aggregation per series — no
    * self-join, no pivot shuffle beyond the single groupBy.
    */
  def ndvi(cube: DataCube, nir: String, red: String): DataCube = {
    val bd = cube.bandDim
    val others = cube.meta.dimNames.filterNot(_ == bd)
    val v = cube.value
    val nirV = max(when(col(bd) === nir, v))
    val redV = max(when(col(bd) === red, v))
    val out = cube.df.groupBy(others.map(col): _*)
      .agg(((nirV - redV) / (nirV + redV)).as(cube.meta.valueCol))
    DataCube(out, cube.meta.without(bd))
  }
}
