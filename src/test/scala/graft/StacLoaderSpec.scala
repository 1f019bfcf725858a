package graft

import graft.core.DimType
import graft.sources.StacLoader
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** load_stac pipeline over a minimal inline STAC item (shape mirrors the
  * reference's Sentinel-2 fixture, tests/data/stac/s2_l2a_test_item.json).
  */
class StacLoaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val item =
    """{"type":"Feature","stac_version":"1.0.0","id":"item-1",
      |"bbox":[10.0,46.0,11.0,47.0],
      |"properties":{"datetime":"2023-06-02T10:18:03Z",
      |  "eo:cloud_cover":12.5,"platform":"sentinel-2a"},
      |"assets":{
      |  "blue":{"href":"s3://bucket/blue.tif","type":"image/tiff; application=geotiff; profile=cloud-optimized",
      |          "eo:bands":[{"name":"B02"}]},
      |  "red":{"href":"s3://bucket/red.tif","type":"image/tiff; application=geotiff; profile=cloud-optimized",
      |         "eo:bands":[{"name":"B04"}]},
      |  "thumbnail":{"href":"s3://bucket/thumb.png","type":"image/png"}
      |}}""".stripMargin

  val zarrItem =
    """{"type":"Feature","stac_version":"1.0.0","id":"item-z",
      |"bbox":[10.0,46.0,11.0,47.0],
      |"properties":{"datetime":"2023-06-09T10:18:03Z",
      |  "eo:cloud_cover":48.0,"platform":"sentinel-2b"},
      |"assets":{
      |  "store":{"href":"s3://bucket/scene.zarr","type":"application/vnd+zarr"}
      |}}""".stripMargin

  test("parseItem extracts raster band assets only, resolving eo:bands names") {
    val assets = StacLoader.parseItem(item)
    assert(assets.map(_.band).toSet == Set("B02", "B04"))
    assert(assets.forall(_.itemId == "item-1"))
  }

  test("filterAssets prunes by band, bbox and time") {
    val assets = StacLoader.parseItem(item)
    assert(StacLoader.filterAssets(assets, bands = Some(Seq("B02"))).size == 1)
    assert(StacLoader.filterAssets(assets,
      bbox = Some((20.0, 50.0, 21.0, 51.0))).isEmpty)
    assert(StacLoader.filterAssets(assets,
      timeRange = Some(("2023-06-01", "2023-06-03"))).size == 2)
    assert(StacLoader.filterAssets(assets,
      timeRange = Some(("2024-01-01", "2024-02-01"))).isEmpty)
  }

  test("zarr assets join the catalog; property filters prune like the API") {
    val assets = StacLoader.parseItem(item) ++ StacLoader.parseItem(zarrItem)
    // zarr stores are raster assets (named by asset key, no eo:bands)
    val z = assets.filter(_.mediaType.contains("zarr"))
    assert(z.map(_.band) == Seq("store") && z.head.itemId == "item-z")
    // STAC query-extension predicates against the static catalog
    assert(StacLoader.filterAssets(assets,
      properties = Map("eo:cloud_cover" -> Seq("lt" -> "20")))
      .forall(_.itemId == "item-1"))
    assert(StacLoader.filterAssets(assets,
      properties = Map("eo:cloud_cover" -> Seq("gte" -> "20", "lte" -> "50")))
      .forall(_.itemId == "item-z"))
    assert(StacLoader.filterAssets(assets,
      properties = Map("platform" -> Seq("eq" -> "sentinel-2a"))).size == 2)
    assert(StacLoader.filterAssets(assets,
      properties = Map("platform" -> Seq("neq" -> "sentinel-2a")))
      .map(_.itemId).distinct == Seq("item-z"))
    // a missing property never matches; unknown operators raise
    assert(StacLoader.filterAssets(assets,
      properties = Map("no:such" -> Seq("eq" -> "x"))).isEmpty)
    intercept[IllegalArgumentException] {
      StacLoader.filterAssets(assets,
        properties = Map("platform" -> Seq("like" -> "s%")))
    }
    // composition: property + band + time filters stack
    assert(StacLoader.filterAssets(assets, bands = Some(Seq("B02", "store")),
      timeRange = Some(("2023-06-01", "2023-06-30")),
      properties = Map("eo:cloud_cover" -> Seq("lt" -> "60"))).size == 2)
  }

  test("loadCube produces a 4-D long-form cube with inferred dim types") {
    val cube = StacLoader.loadCube(spark, StacLoader.parseItem(item), gridSize = 4)
    assert(cube.df.count() == 2 * 16)
    assert(cube.meta.dimType("t") == DimType.Temporal)
    assert(cube.meta.dimType("bands") == DimType.Bands)
    assert(cube.meta.dimType("x") == DimType.Spatial)
    assert(cube.meta.crs.contains("EPSG:4326"))
  }
}
