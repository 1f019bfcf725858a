package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-expression planar geometry for the raster/vector operators.
  *
  * No JTS/GEOS exists in this environment, so the geometry predicates are
  * generated as Catalyst Column expression trees from driver-side polygon
  * constants: a point-in-polygon test over an N-vertex ring unrolls to N
  * codegen'd edge tests — fully fused, no UDF, and the SAME arithmetic can
  * be emitted as SQL text for the DuckDB oracle (`Geo.pointInPolygonSql`),
  * guaranteeing bit-identical classification.
  *
  * (reference counterpart: rasterio geometry_mask /
  * openeo_processes_dask cubes/mask_polygon.py:27-163 and the xvec/shapely
  * predicates used by aggregate_spatial, cubes/aggregate.py:256-323.)
  */
object Geo {

  /** A closed ring as (x, y) vertices; first vertex need not be repeated. */
  type Ring = Seq[(Double, Double)]

  /** Even-odd ray-casting point-in-polygon as a Column expression.
    * Points exactly on an edge are implementation-defined (as in every
    * even-odd rasterizer) — choose polygons off the data grid when that
    * matters.
    */
  def pointInPolygon(px: Column, py: Column, ring: Ring): Column = {
    val edges = ring.zip(ring.tail :+ ring.head)
    val crossings = edges.map { case ((x1, y1), (x2, y2)) =>
      val straddles = (lit(y1) > py) =!= (lit(y2) > py)
      val xAtY = (lit(x2) - x1) * (py - y1) / (lit(y2) - y1) + x1
      when(straddles && px < xAtY, 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** The same predicate as SQL text (DuckDB-compatible), generated from the
    * same constants — the oracle-side twin of [[pointInPolygon]].
    */
  def pointInPolygonSql(px: String, py: String, ring: Ring): String = {
    val edges = ring.zip(ring.tail :+ ring.head)
    val terms = edges.map { case ((x1, y1), (x2, y2)) =>
      s"(CASE WHEN (($y1 > $py) <> ($y2 > $py)) AND " +
        s"($px < ($x2 - $x1) * ($py - $y1) / ($y2 - $y1) + $x1) THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** Envelope of a ring: (west, east, south, north). */
  def envelope(ring: Ring): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._1).max,
      ring.map(_._2).min, ring.map(_._2).max)

  /** Envelope-overlap test between a ring's bbox and a query bbox. */
  def envelopeIntersects(ring: Ring, west: Double, east: Double,
      south: Double, north: Double): Boolean = {
    val (w, e, s, n) = envelope(ring)
    e >= west && w <= east && n >= south && s <= north
  }

  // ---- CRS transforms (public formulas; the reference delegates to pyproj,
  // cubes/_filter.py:284-320) ----

  private val EarthRadius = 6378137.0

  /** EPSG:4326 (lon/lat degrees) → EPSG:3857 (web-mercator meters), as
    * Column expressions — the standard spherical-mercator forward formulas.
    */
  def lonToMercatorX(lon: Column): Column = radians(lon) * EarthRadius
  def latToMercatorY(lat: Column): Column =
    log(tan(lit(math.Pi / 4) + radians(lat) / 2)) * EarthRadius

  /** EPSG:3857 → EPSG:4326 inverse: lat = 2·atan(exp(y/R)) − π/2. */
  def mercatorXToLon(x: Column): Column = degrees(x / EarthRadius)
  def mercatorYToLat(y: Column): Column =
    degrees(atan(exp(y / EarthRadius)) * 2 - lit(math.Pi / 2))

  /** Driver-side scalar twins (for bbox reprojection before filter_bbox,
    * mirroring the reference's driver-side `_reproject_bbox`).
    */
  def lonToMercatorX(lon: Double): Double = math.toRadians(lon) * EarthRadius
  def latToMercatorY(lat: Double): Double =
    math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) * EarthRadius
}
