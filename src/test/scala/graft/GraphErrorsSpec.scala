package graft

import graft.core._
import graft.plans.ProcessGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The openEO TYPED ERROR contract, asserted through the GRAPH entry
  * point (reference: openeo_processes_dask exceptions.py:1-114 and the
  * named raises across its process implementations): each documented
  * failure mode must surface the reference's exception NAME in the error,
  * not a generic message — that name is API surface a client dispatches
  * on. Plan-time errors throw from execute(); lazily-raised ones (the
  * merge_cubes overlap resolver) surface at the first action.
  */
class GraphErrorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** (t, band) cube with MATERIALISED band labels B1/B2 — label-dependent
    * contracts (ndvi band resolution, rename_labels) check against these
    * at metadata scale, like the reference checks xarray coords.
    */
  private def cube: DataCube = {
    val df = Seq(
      ("2024-01-01 00:00:00", "B1", 1.0), ("2024-01-02 00:00:00", "B1", 3.0),
      ("2024-01-01 00:00:00", "B2", 10.0), ("2024-01-02 00:00:00", "B2", 20.0))
      .toDF("t", "band", "value").withColumn("t", to_timestamp(col("t")))
    val c = DataCube.fromTable(df, Seq("t", "band"), "value",
      Map("t" -> DimType.Temporal, "band" -> DimType.Bands))
    DataCube(c.df, c.meta.copy(dims = c.meta.dims.map(d =>
      if (d.name == "band") d.copy(labels = Some(Set("B1", "B2"))) else d)))
  }

  /** spatial (x, y) cube for the kernel case */
  private def xyCube: DataCube = {
    val df = (for (y <- 0 to 3; x <- 0 to 3) yield (x.toDouble, y.toDouble, 1.0))
      .toDF("x", "y", "value")
    DataCube.fromTable(df, Seq("x", "y"), "value",
      Map("x" -> DimType.Spatial, "y" -> DimType.Spatial))
  }

  /** cube with TWO temporal dimensions (t and t2) */
  private def twoTemporalCube: DataCube = {
    val df = Seq(("2024-01-01 00:00:00", "2024-02-01 00:00:00", 1.0))
      .toDF("t", "t2", "value")
      .withColumn("t", to_timestamp(col("t")))
      .withColumn("t2", to_timestamp(col("t2")))
    DataCube.fromTable(df, Seq("t", "t2"), "value",
      Map("t" -> DimType.Temporal, "t2" -> DimType.Temporal))
  }

  private def g(body: String): String =
    s"""{"process_graph": {
       |  "l": {"process_id": "load_collection", "arguments": {"id": "c"}},
       |  $body
       |}}""".stripMargin

  /** run a graph against `cube` and return the full message chain */
  private def errorOf(graph: String, data: DataCube = cube,
      act: Boolean = false): String =
    try {
      val out = ProcessGraph.executeValue(spark, graph, _ => data)
      if (act) out match {
        case ProcessGraph.CubeV(c) => c.df.collect()
        case ProcessGraph.TableV(df) => df.collect()
        case _ =>
      }
      fail(s"graph was expected to raise: $graph")
    } catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case e: Throwable =>
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).mkString(" | ")
    }

  private val reducerMean =
    """{"process_graph": {"m": {"process_id": "mean",
      |  "arguments": {"data": {"from_parameter": "data"}},
      |  "result": true}}}""".stripMargin

  // ---- the pinned table: one case per documented failure mode ----

  test("TemporalExtentEmpty: filter_temporal with both bounds null") {
    val e = errorOf(g(
      """"f": {"process_id": "filter_temporal",
        |      "arguments": {"data": {"from_node": "l"},
        |                    "extent": [null, null]}, "result": true}""".stripMargin))
    assert(e.contains("TemporalExtentEmpty"), e)
  }

  test("QuantilesParameterConflict: probabilities and q together") {
    val e = errorOf(g(
      s""""r": {"process_id": "reduce_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "t",
         |        "reducer": {"process_graph": {
         |          "q": {"process_id": "quantiles",
         |                "arguments": {"data": {"from_parameter": "data"},
         |                              "probabilities": [0.5], "q": 4},
         |                "result": true}}}}, "result": true}""".stripMargin))
    assert(e.contains("QuantilesParameterConflict"), e)
  }

  test("QuantilesParameterMissing: neither probabilities nor q") {
    val e = errorOf(g(
      s""""r": {"process_id": "reduce_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "t",
         |        "reducer": {"process_graph": {
         |          "q": {"process_id": "quantiles",
         |                "arguments": {"data": {"from_parameter": "data"}},
         |                "result": true}}}}, "result": true}""".stripMargin))
    assert(e.contains("QuantilesParameterMissing"), e)
  }

  test("DimensionNotAvailable: reduce_dimension over an absent dimension") {
    val e = errorOf(g(
      s""""r": {"process_id": "reduce_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "zz",
         |                    "reducer": $reducerMean}, "result": true}""".stripMargin))
    assert(e.contains("DimensionNotAvailable"), e)
  }

  test("DimensionNotAvailable: apply_dimension over an absent dimension") {
    val e = errorOf(g(
      s""""d": {"process_id": "apply_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "zz",
         |        "process": {"process_graph": {
         |          "s": {"process_id": "sort",
         |                "arguments": {"data": {"from_parameter": "data"}},
         |                "result": true}}}}, "result": true}""".stripMargin))
    assert(e.contains("DimensionNotAvailable"), e)
  }

  test("DimensionNotAvailable: cumsum along an absent dimension") {
    val e = errorOf(g(
      """"cs": {"process_id": "cumsum",
        |       "arguments": {"data": {"from_node": "l"}, "dimension": "zz"},
        |       "result": true}""".stripMargin))
    assert(e.contains("DimensionNotAvailable"), e)
  }

  test("TooManyDimensions: filter_temporal needs `dimension` with two temporal dims") {
    val e = errorOf(g(
      """"f": {"process_id": "filter_temporal",
        |      "arguments": {"data": {"from_node": "l"},
        |                    "extent": ["2024-01-01", "2024-03-01"]},
        |      "result": true}""".stripMargin), data = twoTemporalCube)
    assert(e.contains("TooManyDimensions"), e)
  }

  test("KernelDimensionsUneven: apply_kernel with an even-sized kernel") {
    val e = errorOf(g(
      """"k": {"process_id": "apply_kernel",
        |      "arguments": {"data": {"from_node": "l"},
        |                    "kernel": [[1, 1], [1, 1]]}, "result": true}""".stripMargin),
      data = xyCube)
    assert(e.contains("KernelDimensionsUneven"), e)
  }

  test("OverlapResolverMissing: merge_cubes overlap without a resolver") {
    // partial band overlap (B2 on both sides, non-null) — the error is
    // raised DISTRIBUTED (raise_error column), so it surfaces on action
    val e = errorOf(g(
      """"f": {"process_id": "filter_bands",
        |      "arguments": {"data": {"from_node": "l"}, "bands": ["B2"]}},
        |  "m": {"process_id": "merge_cubes",
        |      "arguments": {"cube1": {"from_node": "l"},
        |                    "cube2": {"from_node": "f"}},
        |      "result": true}""".stripMargin), act = true)
    assert(e.contains("OverlapResolverMissing"), e)
  }

  test("LabelExists: rename_labels onto an existing label") {
    val e = errorOf(g(
      """"r": {"process_id": "rename_labels",
        |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
        |                    "source": ["B1"], "target": ["B2"]},
        |      "result": true}""".stripMargin))
    assert(e.contains("LabelExists"), e)
  }

  test("LabelNotAvailable: rename_labels from an absent label") {
    val e = errorOf(g(
      """"r": {"process_id": "rename_labels",
        |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
        |                    "source": ["B9"], "target": ["B10"]},
        |      "result": true}""".stripMargin))
    assert(e.contains("LabelNotAvailable"), e)
  }

  test("LabelMismatch: rename_labels with uneven source/target lists") {
    val e = errorOf(g(
      """"r": {"process_id": "rename_labels",
        |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
        |                    "source": ["B1", "B2"], "target": ["X"]},
        |      "result": true}""".stripMargin))
    assert(e.contains("LabelMismatch"), e)
  }

  test("DimensionLabelCountMismatch: add_dimension over an existing name") {
    val e = errorOf(g(
      """"a": {"process_id": "add_dimension",
        |      "arguments": {"data": {"from_node": "l"}, "name": "band",
        |                    "label": "x"}, "result": true}""".stripMargin))
    assert(e.contains("DimensionLabelCountMismatch"), e)
  }

  test("ArrayElementParameterMissing: array_element without index or label") {
    val e = errorOf(g(
      s""""r": {"process_id": "reduce_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
         |        "reducer": {"process_graph": {
         |          "e": {"process_id": "array_element",
         |                "arguments": {"data": {"from_parameter": "data"}},
         |                "result": true}}}}, "result": true}""".stripMargin))
    assert(e.contains("ArrayElementParameterMissing"), e)
  }

  test("ArrayElementParameterConflict: array_element with index AND label") {
    val e = errorOf(g(
      s""""r": {"process_id": "reduce_dimension",
         |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
         |        "reducer": {"process_graph": {
         |          "e": {"process_id": "array_element",
         |                "arguments": {"data": {"from_parameter": "data"},
         |                              "index": 0, "label": "B1"},
         |                "result": true}}}}, "result": true}""".stripMargin))
    assert(e.contains("ArrayElementParameterConflict"), e)
  }

  test("DimensionAmbiguous: ndvi without a bands dimension") {
    val e = errorOf(g(
      """"n": {"process_id": "ndvi",
        |      "arguments": {"data": {"from_node": "l"}}, "result": true}""".stripMargin),
      data = xyCube)
    assert(e.contains("DimensionAmbiguous"), e)
  }

  test("NirBandAmbiguous / RedBandAmbiguous: unresolvable ndvi bands") {
    val eNir = errorOf(g(
      """"n": {"process_id": "ndvi",
        |      "arguments": {"data": {"from_node": "l"}, "nir": "B8",
        |                    "red": "B1"}, "result": true}""".stripMargin))
    assert(eNir.contains("NirBandAmbiguous"), eNir)
    val eRed = errorOf(g(
      """"n": {"process_id": "ndvi",
        |      "arguments": {"data": {"from_node": "l"}, "nir": "B2",
        |                    "red": "B4"}, "result": true}""".stripMargin))
    assert(eRed.contains("RedBandAmbiguous"), eRed)
  }

  test("BandExists: ndvi target_band collides with an existing band") {
    val e = errorOf(g(
      """"n": {"process_id": "ndvi",
        |      "arguments": {"data": {"from_node": "l"}, "nir": "B2",
        |                    "red": "B1", "target_band": "B1"},
        |      "result": true}""".stripMargin))
    assert(e.contains("BandExists"), e)
  }

  test("UnitMismatch: vector_buffer meters over a geographic CRS") {
    // a vector frame that CARRIES its crs (EPSG:4326 = degrees): buffering
    // by a meter distance is the reference's UnitMismatch
    // (geometries.py:127-135)
    val geoms = Seq((1L, "Point", Seq((1.0, 2.0)), "EPSG:4326"))
      .toDF("geom_id", "geom_type", "_coords", "crs")
      .withColumn("geometry",
        expr("transform(_coords, c -> named_struct('x', c._1, 'y', c._2))"))
      .drop("_coords")
    val vcube = DataCube(geoms,
      CubeMetadata(Seq(CubeDim("geom_id", DimType.Other)), None, "geom_id"))
    val e = errorOf(g(
      """"b": {"process_id": "vector_buffer",
        |      "arguments": {"geometries": {"from_node": "l"},
        |                    "distance": 100}, "result": true}""".stripMargin),
      data = vcube)
    assert(e.contains("UnitMismatch"), e)
  }

  test("UnitMismatch: mixed-CRS table with a geographic row later on") {
    // the probe must be an existence filter, not an arbitrary first-row
    // sample: a projected row sampled first must not mask a geographic
    // row elsewhere in the table
    val geoms = Seq(
      (1L, "Point", Seq((500000.0, 4649776.0)), "EPSG:32632"),
      (2L, "Point", Seq((1.0, 2.0)), "EPSG:4326"))
      .toDF("geom_id", "geom_type", "_coords", "crs")
      .withColumn("geometry",
        expr("transform(_coords, c -> named_struct('x', c._1, 'y', c._2))"))
      .drop("_coords")
    val vcube = DataCube(geoms,
      CubeMetadata(Seq(CubeDim("geom_id", DimType.Other)), None, "geom_id"))
    val e = errorOf(g(
      """"b": {"process_id": "vector_buffer",
        |      "arguments": {"geometries": {"from_node": "l"},
        |                    "distance": 100}, "result": true}""".stripMargin),
      data = vcube)
    assert(e.contains("UnitMismatch"), e)
  }

  test("ProcessUnsupported: unknown process id") {
    val e = errorOf(g(
      """"u": {"process_id": "definitely_not_a_process",
        |      "arguments": {"data": {"from_node": "l"}}, "result": true}""".stripMargin))
    assert(e.contains("ProcessUnsupported"), e)
  }

  test("ProcessParameterMissing: unbound from_parameter reference") {
    val e = errorOf(g(
      """"a": {"process_id": "apply",
        |      "arguments": {"data": {"from_node": "l"},
        |        "process": {"process_graph": {
        |          "m": {"process_id": "multiply",
        |                "arguments": {"x": {"from_parameter": "nope"},
        |                              "y": 2}, "result": true}}}},
        |      "result": true}""".stripMargin))
    assert(e.contains("ProcessParameterMissing"), e)
  }

  test("GeometryInvalid: mask_polygon with no polygon in the GeoJSON") {
    val e = errorOf(g(
      """"m": {"process_id": "mask_polygon",
        |      "arguments": {"data": {"from_node": "l"},
        |                    "mask": {"type": "FeatureCollection", "features": []}},
        |      "result": true}""".stripMargin), data = xyCube)
    assert(e.contains("GeometryInvalid"), e)
  }

  // ---- the 10 remaining reference error classes (exceptions.py:17-113),
  // pinned as WIRE-GRAPH behavior ----

  test("ArrayNotLabeled: array_element label access without a labeled context") {
    // `apply`'s scalar context carries no dimension labels — the label
    // parameter has nothing to resolve against (reference arrays.py:86-90)
    val e = errorOf(g(
      """"a": {"process_id": "apply",
        |      "arguments": {"data": {"from_node": "l"},
        |        "process": {"process_graph": {
        |          "el": {"process_id": "array_element",
        |                 "arguments": {"data": {"from_parameter": "x"},
        |                               "label": "B1"}, "result": true}}}},
        |      "result": true}""".stripMargin))
    assert(e.contains("ArrayNotLabeled"), e)
  }

  test("ArrayElementNotAvailable: reduce callback addresses an absent band label") {
    val e = errorOf(g(
      """"r": {"process_id": "reduce_dimension",
        |      "arguments": {"data": {"from_node": "l"}, "dimension": "band",
        |        "reducer": {"process_graph": {
        |          "el": {"process_id": "array_element",
        |                 "arguments": {"data": {"from_parameter": "data"},
        |                               "label": "B9"}, "result": true}}}},
        |      "result": true}""".stripMargin))
    assert(e.contains("ArrayElementNotAvailable"), e)
  }

  test("ArrayLabelConflict: array_concat of labeled arrays sharing a label") {
    val e = errorOf(g(
      """"a": {"process_id": "apply",
        |      "arguments": {"data": {"from_node": "l"},
        |        "process": {"process_graph": {
        |          "c1": {"process_id": "array_create_labeled",
        |                 "arguments": {"data": [1, 2], "labels": ["a", "b"]}},
        |          "c2": {"process_id": "array_create_labeled",
        |                 "arguments": {"data": [3], "labels": ["a"]}},
        |          "cc": {"process_id": "array_concat",
        |                 "arguments": {"array1": {"from_node": "c1"},
        |                               "array2": {"from_node": "c2"}},
        |                 "result": true}}}},
        |      "result": true}""".stripMargin), act = true)
    assert(e.contains("ArrayLabelConflict"), e)
  }

  test("ArrayLengthMismatch: array_create_labeled with uneven lists") {
    val e = errorOf(g(
      """"a": {"process_id": "apply",
        |      "arguments": {"data": {"from_node": "l"},
        |        "process": {"process_graph": {
        |          "c1": {"process_id": "array_create_labeled",
        |                 "arguments": {"data": [1, 2, 3], "labels": ["a", "b"]},
        |                 "result": true}}}},
        |      "result": true}""".stripMargin), act = true)
    assert(e.contains("ArrayLengthMismatch"), e)
  }

  test("ModelNotFound: predict_random_forest with an unresolved model") {
    val e = errorOf(g(
      """"p": {"process_id": "predict_random_forest",
        |      "arguments": {"data": {"from_node": "l"},
        |                    "model": "never-loaded", "dimension": "band"},
        |      "result": true}""".stripMargin))
    assert(e.contains("ModelNotFound"), e)
  }

  test("DimensionMissing: filter_bands on a cube without a band dimension") {
    val e = errorOf(g(
      """"f": {"process_id": "filter_bands",
        |      "arguments": {"data": {"from_node": "l"}, "bands": ["B1"]},
        |      "result": true}""".stripMargin), data = xyCube)
    assert(e.contains("DimensionMissing"), e)
  }

  test("BandFilterParameterMissing: filter_bands without the bands parameter") {
    val e = errorOf(g(
      """"f": {"process_id": "filter_bands",
        |      "arguments": {"data": {"from_node": "l"}}, "result": true}""".stripMargin))
    assert(e.contains("BandFilterParameterMissing"), e)
  }

  test("NoDataAvailable: load_stac extent selecting zero items") {
    val fix = graft.queries.StacFixture.ensure()
    val graph =
      s"""{"process_graph": {
         |  "n": {"process_id": "load_stac",
         |        "arguments": {"url": "file://$fix/catalog.json",
         |          "temporal_extent": ["1999-01-01T00:00:00Z",
         |                              "1999-01-02T00:00:00Z"]},
         |        "result": true}}}""".stripMargin
    val e = errorOf(graph)
    assert(e.contains("NoDataAvailable"), e)
  }

  test("DimensionMismatch: mask carries temporal dims the data lacks") {
    val graph =
      """{"process_graph": {
        |  "l": {"process_id": "load_collection", "arguments": {"id": "c"}},
        |  "m": {"process_id": "load_collection", "arguments": {"id": "m"}},
        |  "k": {"process_id": "mask",
        |        "arguments": {"data": {"from_node": "l"},
        |                      "mask": {"from_node": "m"}}, "result": true}
        |}}""".stripMargin
    val e = try {
      ProcessGraph.execute(spark, graph,
        id => if (id == "m") twoTemporalCube else cube)
      fail(s"graph was expected to raise: $graph")
    } catch {
      case ex: org.scalatest.exceptions.TestFailedException => throw ex
      case ex: Throwable => String.valueOf(ex.getMessage)
    }
    assert(e.contains("DimensionMismatch"), e)
  }

  test("MinMaxSwapped: clip with min above max") {
    val e = errorOf(g(
      """"a": {"process_id": "apply",
        |      "arguments": {"data": {"from_node": "l"},
        |        "process": {"process_graph": {
        |          "c": {"process_id": "clip",
        |                "arguments": {"x": {"from_parameter": "x"},
        |                              "min": 10, "max": 2}, "result": true}}}},
        |      "result": true}""".stripMargin))
    assert(e.contains("MinMaxSwapped"), e)
  }
}
