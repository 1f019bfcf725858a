package graft.operators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cube filter processes. All are plain Catalyst `Filter` nodes over the
  * long-form cube, so predicate pushdown to the parquet scan is automatic
  * (the reference had to hand-roll pushdown only for STAC search,
  * reference: cubes/load.py:113-156).
  */
object FilterOps {

  /** Half-open temporal slice `[start, end)`, dropping null timestamps
    * (reference: cubes/_filter.py:42-106 — the reference subtracts 1 ms from
    * the closed end; we express the same interval half-open directly).
    */
  def filterTemporal(cube: DataCube, start: String, end: String,
      dimension: Option[String] = None): DataCube =
    filterTemporal(cube, Some(start), Some(end), dimension)

  /** Open-interval form: a `None` bound leaves that side unbounded — openEO
    * temporal extents allow `null` for open intervals (reference handles
    * `extent[i] is None`, cubes/_filter.py:42-106); both-null is the spec's
    * `TemporalExtentEmpty` error.
    */
  def filterTemporal(cube: DataCube, start: Option[String],
      end: Option[String], dimension: Option[String]): DataCube = {
    val dim = dimension.getOrElse(cube.temporalDim)
    cube.requireDim(dim)
    require(start.nonEmpty || end.nonEmpty,
      "TemporalExtentEmpty: both temporal bounds are null")
    for (s <- start; e <- end)
      require(s < e, s"TemporalExtentEmpty: [$s, $e)")
    val t = col(dim)
    val lower = start.map(s => t >= to_timestamp(lit(s))).getOrElse(lit(true))
    val upper = end.map(e => t < to_timestamp(lit(e))).getOrElse(lit(true))
    cube.withDf(_.filter(t.isNotNull && lower && upper))
  }

  /** Spatial bounding-box slice, inclusive on all edges like label-based
    * xarray slicing (reference: cubes/_filter.py:171-281). CRS reprojection
    * of the bbox happens driver-side before this is called.
    */
  def filterBbox(cube: DataCube, west: Double, east: Double,
      south: Double, north: Double): DataCube = {
    val sd = cube.meta.spatialDims
    require(sd.size >= 2, "DimensionNotAvailable: need x and y spatial dims")
    val (xd, yd) = (sd.head, sd(1))
    cube.withDf(_.filter(col(xd).between(west, east) && col(yd).between(south, north)))
  }

  /** Band-label selection; errors if any requested band is absent
    * (reference: cubes/_filter.py:133-149). Validation stays IN the plan: a
    * one-row anti-join aggregate counts requested-but-absent bands and a
    * raise_error guard fires at execution time — no driver-side collect, the
    * check runs distributed with the query.
    */
  def filterBands(cube: DataCube, bands: Seq[String],
      validate: Boolean = false): DataCube = {
    if (cube.meta.bandDims.isEmpty) throw new IllegalArgumentException(
      "DimensionMissing: a band dimension is missing") // _filter.py:139-140
    val dim = cube.bandDim
    // narrow MATERIALISED label metadata too — a stale label set makes
    // metadata-first consumers (merge_cubes' case dispatch) misclassify
    // the filtered cube as identical to its parent
    // Label-order convention: materialised labels are an unordered SET
    // (CubeDim.labels) used only for size/membership/set-compare —
    // never for label→index resolution, which always goes through the
    // native column ordering (dimensionLabels orderBy). The reference's
    // filter_bands (sel(bands)) reorders coords to the requested order;
    // here that ordering lives in the column, not the metadata, so the
    // set intersect below loses nothing.
    val keep = bands.toSet
    val narrowed = cube.meta.copy(dims = cube.meta.dims.map(d =>
      if (d.name == dim) d.copy(labels = d.labels.map(_.intersect(keep)))
      else d))
    val filtered = DataCube(
      cube.df.filter(col(dim).isin(bands: _*)), narrowed)
    if (!validate) filtered
    else {
      val spark = cube.df.sparkSession
      import spark.implicits._
      val requested = bands.toDF("_req")
      val missingCnt = requested
        .join(cube.df.select(col(dim)).distinct(),
          col("_req") === col(dim), "left_anti")
        .agg(count(lit(1)).as("_missing"))
      val v = cube.meta.valueCol
      filtered.withDf(_.crossJoin(broadcast(missingCnt))
        .withColumn(v,
          when(col("_missing") > 0,
            raise_error(lit(s"BandFilterParameterMissing: requested band absent")))
            .otherwise(col(v)))
        .drop("_missing"))
    }
  }

  /** Keep rows whose label on `dimension` satisfies `condition` — the
    * condition is a compiled Column predicate over the label value
    * (reference: cubes/_filter.py:109-130, callback over labels).
    */
  def filterLabels(cube: DataCube, dimension: String,
      condition: Column => Column): DataCube = {
    cube.requireDim(dimension)
    // the kept label set is only known at runtime: DROP materialised
    // labels (they revert to implicit distinct values) rather than leave
    // a stale superset for metadata-first consumers
    val cleared = cube.meta.copy(dims = cube.meta.dims.map(d =>
      if (d.name == dimension) d.copy(labels = None) else d))
    DataCube(cube.df.filter(condition(col(dimension))), cleared)
  }
}
