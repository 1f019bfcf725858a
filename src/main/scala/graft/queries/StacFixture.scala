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

  // ---- zarr sibling fixture (driver-green ZarrReader chunk decode) ----

  /** Rank-2 store: 13×11 `<f8` zlib, 5×4 chunks (edge chunks padded per
    * spec), chunk (2,2) OMITTED so the sparse-store fill path decodes for
    * real. value = 2000 + r·20 + c; fill −1.
    */
  val z2 = (13, 11, 5, 4, -1.0)

  /** Rank-3 store: (2 bands, 6, 8) `<f4` uncompressed, (1,4,4) chunks,
    * NESTED `/` dimension_separator. value = b·1000 + r·10 + c
    * (float32-exact).
    */
  val z3 = (2, 6, 8)

  def z2Value(r: Int, c: Int): Double = 2000.0 + r * 20 + c
  def z3Value(b: Int, r: Int, c: Int): Float = (b * 1000 + r * 10 + c).toFloat

  /** Rank-2 zarr V3 store: (5, 6) `float32` little-endian, (3, 4) chunks,
    * `[bytes, gzip, crc32c]` codec chain, default "/"-separated `c/...`
    * keys, bottom-right chunk omitted → fill −7.
    * value = 3000 + r·30 + c (float32-exact).
    */
  val zv3 = (5, 6, 3, 4, -7.0)
  def zv3Value(r: Int, c: Int): Float = (3000 + r * 30 + c).toFloat

  /** Rank-2 zarr v2 store: (38, 30) `<f8` BLOSC(lz4 + byte-shuffle) — the
    * zarr-python DEFAULT compressor — (20, 16) chunks, bottom-right chunk
    * omitted → fill −3. The 2560-byte chunk with a 1024-byte block hint
    * decodes through the container's split path (two 128-element split
    * blocks per chunk) AND its unsplit leftover block (512 B), with
    * byte-lane unshuffle on every block. value = 4000 + r·40 + c (exact).
    */
  val zd = (38, 30, 20, 16, -3.0)
  def zdValue(r: Int, c: Int): Double = 4000.0 + r * 40 + c

  /** Rank-2 zarr V3 store: (6, 7) `float32`, (4, 4) chunks,
    * `[bytes, zstd, crc32c]` codec chain, default `c/` keys, bottom-right
    * chunk omitted → fill −9. value = 5000 + r·50 + c (float32-exact).
    */
  val ze = (6, 7, 4, 4, -9.0)
  def zeValue(r: Int, c: Int): Float = (5000 + r * 50 + c).toFloat

  /** Rank-2 zarr v2 store: (23, 19) `<f8` BLOSC(blosclz + BIT-shuffle) —
    * numcodecs `Blosc(cname='blosclz', shuffle=BITSHUFFLE)` — (16, 12)
    * chunks, bottom-right chunk omitted → fill −5. The 1536-byte chunk
    * with a 1024-byte block hint decodes blosclz through the container's
    * split path (8 byte-lane splits over the 128-element first block) AND
    * the unsplit 512-byte leftover block, with the bit-plane untranspose
    * on every block. value = 6000 + r·60 + c (exact).
    */
  val zf = (23, 19, 16, 12, -5.0)
  def zfValue(r: Int, c: Int): Double = 6000.0 + r * 60 + c

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(1)
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  /** Write (idempotently — content is deterministic) six zarr stores —
    * v2 zlib, v2 raw nested, v3 gzip+crc32c, v2 blosc(lz4+shuffle), v3
    * zstd+crc32c, v2 blosc(blosclz+bit-shuffle) — plus a STAC catalog
    * whose items carry them as
    * `application/vnd+zarr` assets, and return the catalog directory.
    * Grid steps are 1.0 (bbox
    * spans = shape), so every x/y/value in the loaded cube is an exact
    * small integer and the oracle mirrors the whole load arithmetically —
    * catalog traversal, chunk fan-out, zlib inflate, edge-padding clip,
    * missing-chunk fill and the nested-separator walk all sit under one
    * hash-checked query. Reference zarr branch: cubes/load.py:245-304.
    */
  def ensureZarr(): String = synchronized {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stac_zarr_fixture_v4")
    val (h2, w2, cr2, cc2, fill2) = z2
    val a = dir.resolve("zarr_a")
    java.nio.file.Files.createDirectories(a)
    java.nio.file.Files.writeString(a.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[$h2,$w2],"chunks":[$cr2,$cc2],
         |"dtype":"<f8","compressor":{"id":"zlib","level":1},
         |"fill_value":$fill2,"filters":null,"order":"C"}""".stripMargin)
    val (gr2, gc2) = ((h2 + cr2 - 1) / cr2, (w2 + cc2 - 1) / cc2)
    for (gr <- 0 until gr2; gc <- 0 until gc2
         if (gr, gc) != (gr2 - 1, gc2 - 1)) { // last chunk omitted → fill
      val bb = java.nio.ByteBuffer.allocate(cr2 * cc2 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (lr <- 0 until cr2; lc <- 0 until cc2) {
        val (r, c) = (gr * cr2 + lr, gc * cc2 + lc)
        bb.putDouble(if (r < h2 && c < w2) z2Value(r, c) else 0.0) // pad
      }
      java.nio.file.Files.write(a.resolve(s"$gr.$gc"), deflate(bb.array()))
    }
    val (nb, h3, w3) = z3
    val b = dir.resolve("zarr_b")
    for (bi <- 0 until nb; gr <- 0 until (h3 + 3) / 4) {
      val chunkDir = b.resolve(s"$bi").resolve(s"$gr")
      java.nio.file.Files.createDirectories(chunkDir)
      for (gc <- 0 until (w3 + 3) / 4) {
        val bb = java.nio.ByteBuffer.allocate(1 * 4 * 4 * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        for (lr <- 0 until 4; lc <- 0 until 4) {
          val (r, c) = (gr * 4 + lr, gc * 4 + lc)
          bb.putFloat(if (r < h3 && c < w3) z3Value(bi, r, c) else 0f)
        }
        java.nio.file.Files.write(chunkDir.resolve(s"$gc"), bb.array())
      }
    }
    java.nio.file.Files.writeString(b.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[$nb,$h3,$w3],"chunks":[1,4,4],
         |"dtype":"<f4","compressor":null,"fill_value":0,
         |"filters":null,"order":"C","dimension_separator":"/"}""".stripMargin)
    // zarr V3 store: zarr.json metadata, nested c/ keys, gzip+crc32c
    val (h4, w4, cr4, cc4, fill4) = zv3
    val cdir = dir.resolve("zarr_c")
    java.nio.file.Files.createDirectories(cdir)
    java.nio.file.Files.writeString(cdir.resolve("zarr.json"),
      s"""{"zarr_format":3,"node_type":"array","shape":[$h4,$w4],
         |"data_type":"float32",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$cr4,$cc4]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fill4,
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |{"name":"gzip","configuration":{"level":1}},{"name":"crc32c"}],
         |"dimension_names":["y","x"]}""".stripMargin)
    val (gr4, gc4) = ((h4 + cr4 - 1) / cr4, (w4 + cc4 - 1) / cc4)
    for (gr <- 0 until gr4; gc <- 0 until gc4
         if (gr, gc) != (gr4 - 1, gc4 - 1)) { // last chunk omitted → fill
      val bb = java.nio.ByteBuffer.allocate(cr4 * cc4 * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (lr <- 0 until cr4; lc <- 0 until cc4) {
        val (r, c) = (gr * cr4 + lr, gc * cc4 + lc)
        bb.putFloat(if (r < h4 && c < w4) zv3Value(r, c) else 0f) // pad
      }
      val gz = {
        val out = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(bb.array()); g.close(); out.toByteArray
      }
      val crc = new java.util.zip.CRC32C()
      crc.update(gz, 0, gz.length)
      val withCrc = java.util.Arrays.copyOf(gz, gz.length + 4)
      java.nio.ByteBuffer.wrap(withCrc, gz.length, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(crc.getValue.toInt)
      val ck = cdir.resolve("c").resolve(s"$gr")
      java.nio.file.Files.createDirectories(ck)
      java.nio.file.Files.write(ck.resolve(s"$gc"), withCrc)
    }
    // zarr v2 store zarr_d: blosc(lz4 + byte-shuffle) chunks through the
    // pure-JVM container encoder (split + leftover blocks — see [[zd]])
    val (h5, w5, cr5, cc5, fill5) = zd
    val ddir = dir.resolve("zarr_d")
    java.nio.file.Files.createDirectories(ddir)
    java.nio.file.Files.writeString(ddir.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[$h5,$w5],"chunks":[$cr5,$cc5],
         |"dtype":"<f8",
         |"compressor":{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0},
         |"fill_value":$fill5,"filters":null,"order":"C"}""".stripMargin)
    val (gr5, gc5) = ((h5 + cr5 - 1) / cr5, (w5 + cc5 - 1) / cc5)
    for (gr <- 0 until gr5; gc <- 0 until gc5
         if (gr, gc) != (gr5 - 1, gc5 - 1)) { // last chunk omitted → fill
      val bb = java.nio.ByteBuffer.allocate(cr5 * cc5 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (lr <- 0 until cr5; lc <- 0 until cc5) {
        val (r, c) = (gr * cr5 + lr, gc * cc5 + lc)
        bb.putDouble(if (r < h5 && c < w5) zdValue(r, c) else 0.0) // pad
      }
      java.nio.file.Files.write(ddir.resolve(s"$gr.$gc"),
        graft.sources.Blosc.compress(bb.array(), typesize = 8,
          cname = "lz4", byteShuffle = true, blocksizeHint = 1024))
    }
    // zarr V3 store zarr_e: [bytes, zstd, crc32c] codec chain
    val (h6, w6, cr6, cc6, fill6) = ze
    val edir = dir.resolve("zarr_e")
    java.nio.file.Files.createDirectories(edir)
    java.nio.file.Files.writeString(edir.resolve("zarr.json"),
      s"""{"zarr_format":3,"node_type":"array","shape":[$h6,$w6],
         |"data_type":"float32",
         |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$cr6,$cc6]}},
         |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
         |"fill_value":$fill6,
         |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
         |{"name":"zstd","configuration":{"level":3}},{"name":"crc32c"}],
         |"dimension_names":["y","x"]}""".stripMargin)
    val (gr6, gc6) = ((h6 + cr6 - 1) / cr6, (w6 + cc6 - 1) / cc6)
    for (gr <- 0 until gr6; gc <- 0 until gc6
         if (gr, gc) != (gr6 - 1, gc6 - 1)) { // last chunk omitted → fill
      val bb = java.nio.ByteBuffer.allocate(cr6 * cc6 * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (lr <- 0 until cr6; lc <- 0 until cc6) {
        val (r, c) = (gr * cr6 + lr, gc * cc6 + lc)
        bb.putFloat(if (r < h6 && c < w6) zeValue(r, c) else 0f) // pad
      }
      val z = graft.sources.Blosc.zstdCompress(bb.array())
      val crc = new java.util.zip.CRC32C()
      crc.update(z, 0, z.length)
      val withCrc = java.util.Arrays.copyOf(z, z.length + 4)
      java.nio.ByteBuffer.wrap(withCrc, z.length, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(crc.getValue.toInt)
      val ck = edir.resolve("c").resolve(s"$gr")
      java.nio.file.Files.createDirectories(ck)
      java.nio.file.Files.write(ck.resolve(s"$gc"), withCrc)
    }
    // zarr v2 store zarr_f: blosc(blosclz + bit-shuffle) — the remaining
    // numcodecs Blosc corner (cname='blosclz', shuffle=BITSHUFFLE)
    val (h7, w7, cr7, cc7, fill7) = zf
    val fdir = dir.resolve("zarr_f")
    java.nio.file.Files.createDirectories(fdir)
    java.nio.file.Files.writeString(fdir.resolve(".zarray"),
      s"""{"zarr_format":2,"shape":[$h7,$w7],"chunks":[$cr7,$cc7],
         |"dtype":"<f8",
         |"compressor":{"id":"blosc","cname":"blosclz","clevel":5,"shuffle":2,"blocksize":1024},
         |"fill_value":$fill7,"filters":null,"order":"C"}""".stripMargin)
    val (gr7, gc7) = ((h7 + cr7 - 1) / cr7, (w7 + cc7 - 1) / cc7)
    for (gr <- 0 until gr7; gc <- 0 until gc7
         if (gr, gc) != (gr7 - 1, gc7 - 1)) { // last chunk omitted → fill
      val bb = java.nio.ByteBuffer.allocate(cr7 * cc7 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (lr <- 0 until cr7; lc <- 0 until cc7) {
        val (r, c) = (gr * cr7 + lr, gc * cc7 + lc)
        bb.putDouble(if (r < h7 && c < w7) zfValue(r, c) else 0.0) // pad
      }
      java.nio.file.Files.write(fdir.resolve(s"$gr.$gc"),
        graft.sources.Blosc.compress(bb.array(), typesize = 8,
          cname = "blosclz", byteShuffle = false, blocksizeHint = 1024,
          bitShuffle = true))
    }
    // catalog: bbox spans = shape so the loader's grid steps are exactly 1
    val zitems = Seq(
      ("zitem-0", "za", "zarr_a", "2024-03-01T00:00:00Z", w2, h2),
      ("zitem-1", "zb", "zarr_b", "2024-03-02T00:00:00Z", w3, h3),
      ("zitem-2", "zc", "zarr_c", "2024-03-03T00:00:00Z", w4, h4),
      ("zitem-3", "zd", "zarr_d", "2024-03-04T00:00:00Z", w5, h5),
      ("zitem-4", "ze", "zarr_e", "2024-03-05T00:00:00Z", w6, h6),
      ("zitem-5", "zf", "zarr_f", "2024-03-06T00:00:00Z", w7, h7))
    for ((id, band, store, dt, w, h) <- zitems) {
      java.nio.file.Files.writeString(dir.resolve(s"$id.json"),
        s"""{
           |  "type": "Feature",
           |  "stac_version": "1.0.0",
           |  "id": "$id",
           |  "bbox": [0.0, 0.0, $w.0, $h.0],
           |  "properties": {"datetime": "$dt"},
           |  "assets": {
           |    "$band": {"href": "file://$dir/$store",
           |      "type": "application/vnd+zarr",
           |      "eo:bands": [{"name": "$band"}]}
           |  }
           |}""".stripMargin)
    }
    val links = zitems.map { case (id, _, _, _, _, _) =>
      s"""    {"rel": "item", "href": "$id.json"}"""
    }.mkString(",\n")
    java.nio.file.Files.writeString(dir.resolve("zcatalog.json"),
      s"""{
         |  "type": "Catalog",
         |  "stac_version": "1.0.0",
         |  "id": "graft-stac-zarr-fixture",
         |  "description": "deterministic zarr driver fixture",
         |  "links": [
         |$links
         |  ]
         |}""".stripMargin)
    dir.toString
  }
}
