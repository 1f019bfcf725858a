package graft.queries

import graft.sources.TiffWriter

/** Deterministic file:// STAC fixture for the driver-green `stac_load`
  * query (the same synthesize-at-query-build discipline as `pii_redact`'s
  * synthetic PII and `line_dedup`'s spliced boilerplate): a static catalog
  * of four items × two deflate-compressed striped GeoTIFF band assets with
  * id-derived pixels, written idempotently under the JVM temp dir. The
  * pixel formula `item·1000 + band·100 + row·10 + col` is float32-exact,
  * so the DuckDB oracle mirrors the whole load arithmetically — catalog
  * traversal, property/time search pruning, deflate TIFF decode and grid
  * georeferencing all sit under one hash-checked query.
  *
  * Reference shape: cubes/load.py:94-322 + tests/test_load_stac.py:27-52.
  */
object StacFixture {

  val (width, height) = (8, 6)
  val bbox: (Double, Double, Double, Double) = (10.0, 40.0, 12.0, 43.0)
  val bands: Seq[String] = Seq("b01", "b02")

  /** (index, id, datetime, eo:cloud_cover). Items 2 and 3 exist to be
    * PRUNED by the search filters (cloud cover 80; out of time range).
    */
  val items: Seq[(Int, String, String, Int)] = Seq(
    (0, "item-0", "2024-01-01T00:00:00Z", 10),
    (1, "item-1", "2024-01-02T00:00:00Z", 40),
    (2, "item-2", "2024-01-02T12:00:00Z", 80),
    (3, "item-3", "2024-02-01T00:00:00Z", 5))

  def pixel(item: Int, band: Int, r: Int, c: Int): Float =
    (item * 1000 + band * 100 + r * 10 + c).toFloat

  /** Write (or rewrite — content is deterministic) the catalog and return
    * its directory.
    */
  def ensure(): String = synchronized {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stac_fixture_v1")
    java.nio.file.Files.createDirectories(dir)
    for ((idx, id, _, _) <- items; (b, bi) <- bands.zipWithIndex) {
      val vals = Array.tabulate(width * height)(i =>
        pixel(idx, bi, i / width, i % width))
      TiffWriter.write(dir.resolve(s"${id}_$b.tif").toString,
        width, height, vals, deflate = true, rowsPerStrip = 2)
    }
    val (w, s, e, n) = bbox
    for ((_, id, dt, cloud) <- items) {
      val assets = bands.map { b =>
        s"""    "$b": {"href": "file://$dir/${id}_$b.tif",
           |      "type": "image/tiff; application=geotiff; profile=cloud-optimized",
           |      "eo:bands": [{"name": "$b"}]}""".stripMargin
      }.mkString(",\n")
      val item =
        s"""{
           |  "type": "Feature",
           |  "stac_version": "1.0.0",
           |  "id": "$id",
           |  "bbox": [$w, $s, $e, $n],
           |  "properties": {"datetime": "$dt", "eo:cloud_cover": $cloud},
           |  "assets": {
           |$assets
           |  }
           |}""".stripMargin
      java.nio.file.Files.writeString(dir.resolve(s"$id.json"), item)
    }
    val links = items.map { case (_, id, _, _) =>
      s"""    {"rel": "item", "href": "$id.json"}"""
    }.mkString(",\n")
    val catalog =
      s"""{
         |  "type": "Catalog",
         |  "stac_version": "1.0.0",
         |  "id": "graft-stac-fixture",
         |  "description": "deterministic driver fixture",
         |  "links": [
         |$links
         |  ]
         |}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("catalog.json"), catalog)
    dir.toString
  }
}
