package graft.operators

import graft.core._
import org.apache.spark.sql.functions._

/** Band-math indices (reference: openeo_processes_dask/process_implementations/
  * cubes/indices.py:15-59 — ndvi).
  */
object IndicesOps {

  /** ndvi = (nir - red) / (nir + red), resolving bands by label. The band
    * dimension collapses: one conditional aggregation per series — no
    * self-join, no pivot shuffle beyond the single groupBy. With
    * `targetBand` the cube is kept and the index appended as a new band
    * (reference: indices.py:52-57), as one union of the grouped index rows
    * — no join against the original cube.
    *
    * Error contract (reference indices.py:15-57): DimensionAmbiguous when
    * no single bands dimension exists; NirBandAmbiguous / RedBandAmbiguous
    * when the named band is absent; BandExists when `targetBand` already
    * is a band. Band-presence checks run at METADATA scale only — against
    * materialised dimension labels when the cube carries them (the
    * reference checks xarray coords, which always exist there); label-less
    * cubes skip them rather than paying a per-call distinct scan.
    */
  def ndvi(cube: DataCube, nir: String = "nir", red: String = "red",
      targetBand: Option[String] = None): DataCube = {
    val bd = cube.meta.bandDims match {
      case Seq(b) => b
      case _ => throw new IllegalArgumentException(
        "DimensionAmbiguous: dimension of type `bands` is not available " +
          "or is ambiguous")
    }
    val bandLabels = cube.meta.dims.find(_.name == bd).flatMap(_.labels)
    bandLabels.foreach { ls =>
      if (!ls.contains(nir)) throw new IllegalArgumentException(
        "NirBandAmbiguous: the NIR band can't be resolved, please specify " +
          "the specific NIR band name")
      if (!ls.contains(red)) throw new IllegalArgumentException(
        "RedBandAmbiguous: the Red band can't be resolved, please specify " +
          "the specific Red band name")
    }
    targetBand.foreach { tb =>
      if (bandLabels.exists(_.contains(tb)))
        throw new IllegalArgumentException(
          "BandExists: a band with the specified target name exists")
    }
    val others = cube.meta.dimNames.filterNot(_ == bd)
    val v = cube.value
    val nirV = max(when(col(bd) === nir, v))
    val redV = max(when(col(bd) === red, v))
    val out = cube.df.groupBy(others.map(col): _*)
      .agg(((nirV - redV) / (nirV + redV)).as(cube.meta.valueCol))
    targetBand match {
      case None => DataCube(out, cube.meta.without(bd))
      case Some(tb) =>
        val ndRows = out.withColumn(bd, lit(tb))
          .select(cube.df.columns.map(col).toIndexedSeq: _*)
        val meta = cube.meta.copy(dims = cube.meta.dims.map(d =>
          if (d.name == bd) d.copy(labels = d.labels.map(_ + tb)) else d))
        DataCube(cube.df.unionByName(ndRows), meta)
    }
  }
}
