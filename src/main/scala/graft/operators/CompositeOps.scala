package graft.operators

import graft.core._
import org.apache.spark.sql.functions._

/** Domain composites built purely from already-mapped operators
  * (reference: openeo_processes_dask experimental/ddmc.py:8-84 — a
  * multi-band index assembled from band differences + add_dimension +
  * merge_cubes).
  */
object CompositeOps {

  /** Normalized difference of two named bands, collapsing the band dim —
    * the generalization of ndvi (reference: cubes/indices.py uses the same
    * (a−b)/(a+b) core).
    */
  def normalizedBandDifference(cube: DataCube, a: String, b: String): DataCube =
    IndicesOps.ndvi(cube, nir = a, red = b)

  /** ddmc-style composite: each output band is the normalized difference of
    * an input band pair; results are stacked on a fresh band dimension.
    * The stacking is merge_cubes' disjoint-label case (reference:
    * merge.py:170-228), realized as its physical optimum — a unionByName —
    * rather than a degenerate full-outer join that can never match keys.
    */
  def bandDifferenceComposite(cube: DataCube, bandDim: String,
      pairs: Seq[(String, (String, String))]): DataCube = {
    require(pairs.nonEmpty, "need at least one band pair")
    val stacked = pairs.map { case (name, (a, b)) =>
      CubeDimOps.addDimension(
        normalizedBandDifference(cube, a, b), bandDim, name, DimType.Bands)
    }
    stacked.reduce { (c1, c2) =>
      DataCube(c1.df.unionByName(c2.df), c1.meta)
    }
  }
}
