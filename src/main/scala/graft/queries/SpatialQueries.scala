package graft.queries

import graft.core._
import graft.functions.{Reducers, Scalar}
import graft.geo.Geo
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness queries for the polygon/vector/CRS operator family
  * (SURVEY.md §2.2 filter_spatial, §2.3 mask_polygon + aggregate_spatial +
  * resample_cube_spatial, §2.10, §2.12) and the text/date scalar functions.
  *
  * The point-in-polygon oracles are GENERATED from the same ring constants
  * as the Spark plans (Geo.pointInPolygonSql), so both engines evaluate
  * identical arithmetic.
  */
object SpatialQueries {

  type Q = (SparkSession, String) => DataFrame

  // vertices offset by .5 so no integer grid point lies on an edge
  private val ring: Geo.Ring = Seq(
    (20.5, 1.5), (180.5, 0.5), (190.5, 9.5), (100.5, 9.8), (10.5, 8.5))

  private val zoneA: Geo.Ring = Seq((0.5, 0.5), (100.5, 0.5), (50.5, 10.5))
  private val zoneB: Geo.Ring = Seq((80.5, 0.5), (200.5, 0.5), (200.5, 10.5), (80.5, 10.5))

  private val targetXs: Seq[Double] = (0 until 15).map(i => 3.0 + 14 * i)
  private val targetYs: Seq[Double] = Seq(2.0, 5.0, 8.0)

  private def gridCube(s: SparkSession, dir: String): DataCube =
    Tables.lineitemCube(s, dir,
      Seq("l_partkey" -> "x", "l_suppkey" -> "y", "l_returnflag" -> "band"))

  // inline GeoJSON fixture (mirrors the reference's test fixtures,
  // tests/conftest.py:142-181: point + polygon features with properties)
  private val geojson =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","geometry":{"type":"Point","coordinates":[3.2,4.1]},
      | "properties":{"class":"a"}},
      |{"type":"Feature","geometry":{"type":"Point","coordinates":[10.25,-2.5]},
      | "properties":{"class":"b"}},
      |{"type":"Feature","geometry":{"type":"Polygon","coordinates":
      |  [[[0.0,0.0],[4.0,0.0],[4.0,3.0],[0.0,3.0],[0.0,0.0]]]},
      | "properties":{"class":"c"}}]}""".stripMargin

  // filter_vector fixture: a diamond that contains point `a`, misses
  // point `b`, and pokes a vertex into the square `c`
  private val filterDiamond: Geo.Ring =
    Seq((3.0, 2.0), (6.0, 4.0), (3.0, 6.0), (0.0, 4.0))

  // vector_random_points fixture: a triangle covering exactly half its
  // 6x6 bbox, so bbox-uniform candidates reject ~50% of the time
  private val randomPtsGeojson =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","geometry":{"type":"Point","coordinates":[1.5,1.5]},
      | "properties":{"class":"p"}},
      |{"type":"Feature","geometry":{"type":"Polygon","coordinates":
      |  [[[0.0,0.0],[6.0,0.0],[0.0,6.0],[0.0,0.0]]]},
      | "properties":{"class":"t"}}]}""".stripMargin

  val queries: Map[String, Q] = Map(
    "mask_polygon" -> { (s, dir) =>
      val masked = SpatialOps.maskPolygon(gridCube(s, dir), ring)
      masked.df.groupBy(col("band")).agg(
        count(col("value")).as("n_in"),
        sum(col("value")).cast("bigint").as("sum_in"))
    },
    "filter_spatial" -> { (s, dir) =>
      val kept = SpatialOps.filterSpatial(gridCube(s, dir), ring)
      kept.df.groupBy(col("band")).agg(
        count(lit(1)).as("n"),
        sum(col("value")).cast("bigint").as("sum_qty"))
    },
    "apply_polygon" -> { (s, dir) =>
      val doubled = SpatialOps.applyPolygon(gridCube(s, dir), ring,
        v => Scalar.multiply(v, lit(2)))
      doubled.df.groupBy(col("band"))
        .agg(sum(col("value")).cast("bigint").as("sum_v"))
    },
    "aggregate_spatial" -> { (s, dir) =>
      val c = gridCube(s, dir)
      val sums = SpatialOps.aggregateSpatial(c, Seq("A" -> zoneA, "B" -> zoneB),
        v => Reducers.sumR(v))
      val counts = SpatialOps.aggregateSpatial(c, Seq("A" -> zoneA, "B" -> zoneB),
        _ => Reducers.countAll())
      sums.withColumnRenamed("value", "sum_qty")
        .withColumn("sum_qty", col("sum_qty").cast("bigint"))
        .join(counts.withColumnRenamed("value", "n"), Seq("zone", "band"))
    },
    "aggregate_spatial_many" -> { (s, dir) =>
      // the zone-TABLE form: same zones, but flowing through the single-scan
      // broadcast join + ring-column ray-cast instead of per-zone plan branches
      import s.implicits._
      val zones = Seq(("A", zoneA), ("B", zoneB)).toDF("zone_id", "_pts")
        .withColumn("geometry",
          expr("transform(_pts, p -> struct(p._1 as x, p._2 as y))"))
      val out = SpatialOps.aggregateSpatialMany(gridCube(s, dir), zones,
        "zone_id", "geometry", v => Reducers.sumR(v))
      out.select(col("zone"), col("band"), col("value").cast("bigint").as("sum_qty"))
    },
    "resample_cube_spatial" -> { (s, dir) =>
      val c = Tables.lineitemCube(s, dir,
        Seq("l_partkey" -> "x", "l_suppkey" -> "y"))
      val r = SpatialOps.resampleCubeSpatialNear(c, targetXs, targetYs,
        v => Reducers.sumR(v))
      r.df.select(col("x"), col("y"), col("value").cast("bigint").as("sum_qty"))
    },
    "resample_bilinear" -> { (s, dir) =>
      val grid = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("x"), col("l_suppkey").as("y"))
        .agg(sum(col("l_quantity")).cast("bigint").as("value"))
      val c = DataCube.fromTable(grid, Seq("x", "y"), "value",
        Map("x" -> DimType.Spatial, "y" -> DimType.Spatial))
      // quarter-fraction targets: weights are exact binary doubles
      val targets = Seq((10.25, 3.5), (50.75, 7.25), (120.5, 4.75), (199.25, 8.5))
      val r = ResampleOps.resampleSpatialBilinear(c, targets)
      r.df.select(col("x"), col("y"), col("value").as("v"))
    },
    // true 2-D apply_neighborhood: size 4×4, overlap 1 → 6×6 windows on a
    // stride-5 center grid; sum-reduce each window over the (x, y) grid
    "apply_neighborhood_2d" -> { (s, dir) =>
      val c = Tables.lineitemCube(s, dir,
        Seq("l_partkey" -> "x", "l_suppkey" -> "y"))
      val r = WindowOps.applyNeighborhood2D(c, sizeX = 4, sizeY = 4,
        v => Reducers.sumR(v), overlapX = 1, overlapY = 1)
      r.df.select(col("x"), col("y"), col("value").cast("bigint").as("sum_v"))
    },
    // resample_spatial(projection=...): warp the grid cube 4326 → UTM 33N
    // and back through the generalized Transverse-Mercator series. The
    // oracle checks the round-trip property (forward∘inverse = identity at
    // µdeg precision — the series' error is ~1e-9° inside the zone, 500×
    // below the rounding boundary): coordinates come back out as they went
    // in, values untouched.
    "crs_warp_roundtrip" -> { (s, dir) =>
      val pts = Tables.lineitem(s, dir)
        .groupBy(
          (lit(12.0) + (col("l_partkey") % 2000) / lit(500.0)).as("x"),
          (lit(41.0) + (col("l_suppkey") % 100) / lit(12.5)).as("y"))
        .agg(sum(col("l_quantity")).cast("bigint").as("value"))
      val c = DataCube.fromTable(pts, Seq("x", "y"), "value",
        Map("x" -> DimType.Spatial, "y" -> DimType.Spatial),
        crs = Some("EPSG:4326"))
      val back = ResampleOps.warpCube(
        ResampleOps.warpCube(c, "EPSG:32633"), "EPSG:4326")
      back.df.select(round(col("x"), 6).as("lon"),
        round(col("y"), 6).as("lat"), col("value"))
    },
    "vector_reproject" -> { (s, dir) =>
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") % 360 - 180 + 0.25).as("lon"),
        (col("c_custkey") % 170 - 85 + 0.25).as("lat"))
      pts.select(col("c_custkey"),
        round(Geo.lonToMercatorX(col("lon")), 2).as("mx"),
        round(Geo.latToMercatorY(col("lat")), 2).as("my"))
    },
    "filter_vector" -> { (s, dir) =>
      // openEO filter_vector proposal: geometries intersecting a diamond
      // — the point feature lands inside it (case 1: vertex-in-filter),
      // the square encloses a diamond vertex (case 2: filter-vertex-in-
      // geometry), the far point drops. The oracle is the driver-side
      // replay of the same three-case double arithmetic (the vector-
      // fixture protocol).
      val vc = VectorOps.loadGeoJson(s, geojson, Seq("class"))
      VectorOps.filterVector(vc, "geometry", filterDiamond)
        .select(col("geom_id"), col("geom_type"), col("class"),
          size(col("geometry")).as("n_vertices"))
    },
    "vector_geojson_buffer" -> { (s, dir) =>
      val vc = VectorOps.loadGeoJson(s, geojson, Seq("class"))
      val pts = VectorOps.bufferPoints(
        vc.filter(col("geom_type") === "Point"), "geometry", 1.5)
      val all = pts.unionByName(vc.filter(col("geom_type") === "Polygon"))
      val filtered = VectorOps.filterBboxVector(all, "geometry", 0.0, 12.0, -6.0, 6.0)
      filtered.select(col("geom_id"), col("geom_type"), col("class"),
        size(col("geometry")).as("n_vertices"),
        round(aggregate(transform(col("geometry"), _.getField("x")),
          lit(0.0), _ + _), 6).as("sum_x"))
    },
    "vector_regular_points" -> { (s, dir) =>
      // openEO vector_to_regular_points proposal: the fixture polygon
      // sampled at 0.7 spacing (grid anchored at its bbox min), the two
      // point features passing through; px/py rounded identically on
      // both engines
      val vc = VectorOps.loadGeoJson(s, geojson, Seq("class"))
      val pts = VectorOps.vectorToRegularPoints(vc, "geometry", 0.7)
      pts.select(col("geom_id"), col("geom_type"), col("class"),
        col("point_id"),
        round(element_at(col("geometry"), 1).getField("x"), 6).as("px"),
        round(element_at(col("geometry"), 1).getField("y"), 6).as("py"))
    },
    "vector_random_points" -> { (s, dir) =>
      // openEO vector_to_random_points proposal: 12 seeded md5-derived
      // points inside a TRIANGLE (half its bbox, so the rejection path
      // genuinely bites: ~half the 96 candidates drop), the point feature
      // passing through; the oracle replays the same hash fold, bbox
      // scaling, and ray-cast in SQL
      val vc = VectorOps.loadGeoJson(s, randomPtsGeojson, Seq("class"))
      val pts = VectorOps.vectorToRandomPoints(vc, "geometry",
        count = 12, oversample = 8, seed = "rp")
      pts.select(col("geom_id"), col("class"), col("point_id"),
        round(element_at(col("geometry"), 1).getField("x"), 6).as("px"),
        round(element_at(col("geometry"), 1).getField("y"), 6).as("py"))
    },
    "text_date_fns" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.select(col("o_orderkey"),
        Scalar.textBegins(col("o_orderpriority"), "1").as("p_begins"),
        Scalar.textContains(col("o_orderpriority"), "urgent",
          caseSensitive = false).as("p_urgent"),
        Scalar.textEnds(col("o_orderpriority"), "NT").as("p_ends"),
        Scalar.dateShift(col("o_orderdate"), 1, "month").cast("date").as("next_month"),
        Scalar.dateDifference(to_timestamp(lit("1995-01-01")),
          col("o_orderdate"), "month").cast("bigint").as("months_since"),
        Scalar.dateBetween(col("o_orderdate"),
          to_timestamp(lit("1995-06-01")), to_timestamp(lit("1996-01-01"))).as("in_h2"))
    }
  )

  private def pip(px: String, py: String, r: Geo.Ring): String =
    Geo.pointInPolygonSql(px, py, r)

  val oracles: Map[String, String] = {
    // expected vector_geojson_buffer rows, computed driver-side with the
    // exact same double arithmetic the plan constants use
    val bufferedRows = {
      val pts = Seq((0L, "a", 3.2, 4.1), (1L, "b", 10.25, -2.5))
      val offsets = (0 until 16).map { k =>
        val a = 2 * math.Pi * k / 16
        (1.5 * math.cos(a), 1.5 * math.sin(a))
      }
      val pointRows = pts.map { case (id, cls, px, py) =>
        val xs = offsets.map { case (dx, dy) => px + dx }
        val inBbox = {
          val ys = offsets.map { case (dx, dy) => py + dy }
          xs.max >= 0.0 && xs.min <= 12.0 && ys.max >= -6.0 && ys.min <= 6.0
        }
        // replicate Spark's round(col, 6) exactly: HALF_UP on the decimal
        val sumX = BigDecimal(xs.foldLeft(0.0)(_ + _))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, "Point", cls, 16, sumX, inBbox)
      }
      val polyRow = (2L, "Polygon", "c", 5, 8.0, true)
      (pointRows :+ polyRow).filter(_._6).map { case (id, t, c, n, sx, _) =>
        s"($id, '$t', '$c', $n, CAST($sx AS DOUBLE))"
      }.mkString(",\n  ")
    }
    Map(
      "mask_polygon" ->
        s"""SELECT l_returnflag AS band,
           |  count(CASE WHEN ${pip("l_partkey", "l_suppkey", ring)} THEN 1 END) AS n_in,
           |  CAST(sum(CASE WHEN ${pip("l_partkey", "l_suppkey", ring)} THEN l_quantity END) AS BIGINT) AS sum_in
           |FROM lineitem GROUP BY 1""".stripMargin,
      "filter_spatial" ->
        s"""SELECT l_returnflag AS band, count(*) AS n,
           |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM lineitem
           |WHERE l_partkey BETWEEN 10.5 AND 190.5 AND l_suppkey BETWEEN 0.5 AND 9.8
           |  AND ${pip("l_partkey", "l_suppkey", ring)}
           |GROUP BY 1""".stripMargin,
      "apply_polygon" ->
        s"""SELECT l_returnflag AS band,
           |  CAST(sum(CASE WHEN ${pip("l_partkey", "l_suppkey", ring)}
           |       THEN l_quantity * 2 ELSE l_quantity END) AS BIGINT) AS sum_v
           |FROM lineitem GROUP BY 1""".stripMargin,
      "aggregate_spatial" ->
        s"""WITH z AS (
           |  SELECT 'A' AS zone, l_returnflag AS band, l_quantity FROM lineitem
           |  WHERE ${pip("l_partkey", "l_suppkey", zoneA)}
           |  UNION ALL
           |  SELECT 'B' AS zone, l_returnflag AS band, l_quantity FROM lineitem
           |  WHERE ${pip("l_partkey", "l_suppkey", zoneB)})
           |SELECT zone, band, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           |       count(*) AS n
           |FROM z GROUP BY 1, 2""".stripMargin,
      "aggregate_spatial_many" ->
        s"""WITH z AS (
           |  SELECT 'A' AS zone, l_returnflag AS band, l_quantity FROM lineitem
           |  WHERE ${pip("l_partkey", "l_suppkey", zoneA)}
           |  UNION ALL
           |  SELECT 'B' AS zone, l_returnflag AS band, l_quantity FROM lineitem
           |  WHERE ${pip("l_partkey", "l_suppkey", zoneB)})
           |SELECT zone, band, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM z GROUP BY 1, 2""".stripMargin,
      "resample_cube_spatial" ->
        s"""WITH xm AS (SELECT x, t FROM (
           |    SELECT x, t, row_number() OVER (PARTITION BY x ORDER BY abs(x - t), t) AS rn
           |    FROM (SELECT DISTINCT CAST(l_partkey AS DOUBLE) AS x FROM lineitem)
           |    CROSS JOIN (SELECT 3.0 + 14 * i AS t FROM range(0, 15) r(i))) WHERE rn = 1),
           |ym AS (SELECT y, t FROM (
           |    SELECT y, t, row_number() OVER (PARTITION BY y ORDER BY abs(y - t), t) AS rn
           |    FROM (SELECT DISTINCT CAST(l_suppkey AS DOUBLE) AS y FROM lineitem)
           |    CROSS JOIN (VALUES (2.0), (5.0), (8.0)) v(t)) WHERE rn = 1)
           |SELECT xm.t AS x, ym.t AS y, CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
           |FROM lineitem l JOIN xm ON xm.x = l.l_partkey JOIN ym ON ym.y = l.l_suppkey
           |GROUP BY 1, 2""".stripMargin,
      "resample_bilinear" ->
        """WITH g AS (SELECT l_partkey AS x, l_suppkey AS y,
          |                  CAST(sum(l_quantity) AS BIGINT) AS v
          |           FROM lineitem GROUP BY 1, 2),
          |t(tx, ty) AS (VALUES (10.25, 3.5), (50.75, 7.25), (120.5, 4.75), (199.25, 8.5)),
          |c AS (SELECT tx, ty, floor(tx) + dx AS sx, floor(ty) + dy AS sy,
          |        (1 - abs(tx - (floor(tx) + dx))) * (1 - abs(ty - (floor(ty) + dy))) AS w,
          |        dx * 2 + dy AS corner
          |      FROM t, (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) d(dx, dy)),
          |j AS (SELECT c.tx, c.ty, c.corner, c.w * g.v AS wv
          |      FROM c JOIN g ON g.x = c.sx AND g.y = c.sy),
          |p AS (SELECT tx, ty,
          |        max(CASE WHEN corner = 0 THEN wv END) AS w0,
          |        max(CASE WHEN corner = 1 THEN wv END) AS w1,
          |        max(CASE WHEN corner = 2 THEN wv END) AS w2,
          |        max(CASE WHEN corner = 3 THEN wv END) AS w3
          |      FROM j GROUP BY 1, 2)
          |SELECT tx AS x, ty AS y, w0 + w1 + w2 + w3 AS v FROM p""".stripMargin,
      "apply_neighborhood_2d" ->
        // same center-generation arithmetic: win 6, stride 5, coverage
        // [c-3, c+2] per axis
        """WITH cells AS (SELECT l_partkey AS x, l_suppkey AS y, l_quantity AS v
          |               FROM lineitem),
          |e AS (SELECT cx.g * 5 AS wx, cy.g * 5 AS wy, v
          |      FROM cells,
          |      LATERAL (SELECT unnest(generate_series(
          |        CAST(ceil((x - 2) / 5.0) AS BIGINT),
          |        CAST(floor((x + 3) / 5.0) AS BIGINT))) AS g) cx,
          |      LATERAL (SELECT unnest(generate_series(
          |        CAST(ceil((y - 2) / 5.0) AS BIGINT),
          |        CAST(floor((y + 3) / 5.0) AS BIGINT))) AS g) cy)
          |SELECT wx AS x, wy AS y, CAST(sum(v) AS BIGINT) AS sum_v
          |FROM e GROUP BY 1, 2""".stripMargin,
      "crs_warp_roundtrip" ->
        // round-trip identity: the oracle is the untransformed grid — any
        // warp error above µdeg precision breaks the hash
        """WITH g AS (SELECT
          |    CAST(12 AS DOUBLE) + (l_partkey % 2000) / CAST(500 AS DOUBLE) AS gx,
          |    CAST(41 AS DOUBLE) + (l_suppkey % 100) / CAST(12.5 AS DOUBLE) AS gy,
          |    l_quantity FROM lineitem)
          |SELECT round(gx, 6) AS lon, round(gy, 6) AS lat,
          |       CAST(sum(l_quantity) AS BIGINT) AS value
          |FROM g GROUP BY gx, gy""".stripMargin,
      "vector_reproject" ->
        """SELECT c_custkey,
          |  round(radians(c_custkey % 360 - 180 + 0.25) * 6378137.0, 2) AS mx,
          |  round(ln(tan(pi()/4 + radians(c_custkey % 170 - 85 + 0.25)/2)) * 6378137.0, 2) AS my
          |FROM customer""".stripMargin,
      "vector_geojson_buffer" ->
        s"""SELECT * FROM (VALUES
           |  $bufferedRows
           |) t(geom_id, geom_type, class, n_vertices, sum_x)""".stripMargin,
      "filter_vector" -> {
        // driver-side replay of filterVector's three-case test with the
        // IDENTICAL double arithmetic and edge sets (constant filter ring
        // wraps; the stored GeoJSON rings are closed, so geometry edges
        // are consecutive pairs without wraparound)
        val fixture = Seq(
          (0L, "Point", "a", Seq((3.2, 4.1))),
          (1L, "Point", "b", Seq((10.25, -2.5))),
          (2L, "Polygon", "c",
            Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0))))
        def pipWrap(px: Double, py: Double, ring: Geo.Ring): Boolean = {
          val edges = ring.zip(ring.tail :+ ring.head)
          edges.count { case ((x1, y1), (x2, y2)) =>
            ((y1 > py) != (y2 > py)) &&
              px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
          } % 2 == 1
        }
        def pipClosed(px: Double, py: Double,
            g: Seq[(Double, Double)]): Boolean =
          g.size >= 3 && g.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
            ((y1 > py) != (y2 > py)) &&
              px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
          } % 2 == 1
        def orient(px: Double, py: Double, qx: Double, qy: Double,
            rx: Double, ry: Double): Double =
          (qx - px) * (ry - py) - (qy - py) * (rx - px)
        val fEdges = filterDiamond.zip(filterDiamond.tail :+ filterDiamond.head)
        def onSeg(px: Double, py: Double, qx: Double, qy: Double,
            rx: Double, ry: Double): Boolean =
          rx >= math.min(px, qx) && rx <= math.max(px, qx) &&
            ry >= math.min(py, qy) && ry <= math.max(py, qy)
        def intersects(g: Seq[(Double, Double)]): Boolean = {
          val c1 = g.exists { case (x, y) => pipWrap(x, y, filterDiamond) }
          val c2 = filterDiamond.exists { case (fx, fy) => pipClosed(fx, fy, g) }
          val c3 = g.size >= 2 && g.sliding(2).exists {
            case Seq((ax, ay), (bx, by)) => fEdges.exists {
              case ((cx, cy), (dx, dy)) =>
                orient(cx, cy, dx, dy, ax, ay) *
                  orient(cx, cy, dx, dy, bx, by) < 0 &&
                orient(ax, ay, bx, by, cx, cy) *
                  orient(ax, ay, bx, by, dx, dy) < 0
            }
          }
          // closed-set boundary touches (filterVector cases 4 + 5)
          val c4 = g.exists { case (vx, vy) =>
            fEdges.exists { case ((cx, cy), (dx, dy)) =>
              orient(cx, cy, dx, dy, vx, vy) == 0 &&
                onSeg(cx, cy, dx, dy, vx, vy)
            }
          }
          val c5 = g.size >= 2 && g.sliding(2).exists {
            case Seq((ax, ay), (bx, by)) => filterDiamond.exists {
              case (fx, fy) =>
                orient(ax, ay, bx, by, fx, fy) == 0 &&
                  onSeg(ax, ay, bx, by, fx, fy)
            }
          }
          g.nonEmpty && (c1 || c2 || c3 || c4 || c5)
        }
        val rows = fixture.filter(f => intersects(f._4)).map {
          case (id, t, c, g) => s"($id, '$t', '$c', ${g.size})"
        }.mkString(",\n  ")
        s"""SELECT * FROM (VALUES
           |  $rows
           |) t(geom_id, geom_type, class, n_vertices)""".stripMargin
      },
      "vector_regular_points" -> {
        // the SAME ray-cast arithmetic as the Spark predicate, generated
        // from the SAME ring constants (incl. the GeoJSON closing vertex —
        // its degenerate edge contributes 0 crossings in both engines)
        val gjRing: Geo.Ring = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0),
          (0.0, 3.0), (0.0, 0.0))
        s"""WITH gi AS (SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, 5) t(i)),
           |gj AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 4) t(j)),
           |pts AS (SELECT i, j, 0.0 + i*0.7 AS px, 0.0 + j*0.7 AS py
           |        FROM gi CROSS JOIN gj)
           |SELECT CAST(2 AS BIGINT) AS geom_id, 'Point' AS geom_type,
           |       'c' AS class, i*5 + j AS point_id,
           |       round(px, 6) AS px, round(py, 6) AS py
           |FROM pts WHERE ${Geo.pointInPolygonSql("px", "py", gjRing)}
           |UNION ALL SELECT CAST(0 AS BIGINT), 'Point', 'a', CAST(0 AS BIGINT), 3.2, 4.1
           |UNION ALL SELECT CAST(1 AS BIGINT), 'Point', 'b', CAST(0 AS BIGINT), 10.25, -2.5""".stripMargin
      },
      "vector_random_points" -> {
        // the SAME md5 16-bit fold (Sampling.hashBucket's portable-hash
        // convention), bbox scaling in the SAME double-op order, and the
        // SAME ray-cast arithmetic as the Spark plan
        val triRing: Geo.Ring = Seq((0.0, 0.0), (6.0, 0.0), (0.0, 6.0),
          (0.0, 0.0))
        def h16(axis: String): String = {
          val h = s"md5('1:' || k || ':$axis:rp')"
          (0 until 4).map { i =>
            s"(instr('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * ${1L << (4 * (3 - i))}"
          }.mkString("(", " + ", ")")
        }
        s"""WITH ks AS (SELECT CAST(k AS BIGINT) AS k FROM generate_series(0, 95) t(k)),
           |c AS (SELECT k,
           |        0.0 + (${h16("x")} / 65536.0) * (6.0 - 0.0) AS px,
           |        0.0 + (${h16("y")} / 65536.0) * (6.0 - 0.0) AS py
           |      FROM ks),
           |a AS (SELECT k, px, py FROM c
           |      WHERE ${Geo.pointInPolygonSql("px", "py", triRing)}),
           |r AS (SELECT row_number() OVER (ORDER BY k) - 1 AS point_id,
           |             px, py FROM a)
           |SELECT CAST(1 AS BIGINT) AS geom_id, 't' AS class,
           |       CAST(point_id AS BIGINT) AS point_id,
           |       round(px, 6) AS px, round(py, 6) AS py
           |FROM r WHERE point_id < 12
           |UNION ALL SELECT CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT), 1.5, 1.5""".stripMargin
      },
      "text_date_fns" ->
        """SELECT o_orderkey,
          |  starts_with(o_orderpriority, '1') AS p_begins,
          |  contains(lower(o_orderpriority), 'urgent') AS p_urgent,
          |  ends_with(o_orderpriority, 'NT') AS p_ends,
          |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
          |  (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since,
          |  o_orderdate >= TIMESTAMP '1995-06-01' AND o_orderdate < TIMESTAMP '1996-01-01' AS in_h2
          |FROM orders""".stripMargin
    )
  }
}
