package graft.sources

import graft.core.DataCube
import org.apache.spark.sql.functions._

/** Distributed zarr v2/v3 store writer — the cloud-native counterpart of
  * [[TiffWriter]], and the reason save_result can export rasters of ANY
  * size: the driver writes only the `.zarray` metadata document, while the
  * chunk files are assembled and written BY THE EXECUTORS — each task owns
  * whole chunks (one `groupByKey(chunkKey)` shuffle), deflates its own
  * bytes, and writes its own files, mirroring how [[ZarrReader]] fans
  * decode out per-chunk. Cells absent from the cube become `fill_value`
  * (NaN), which round-trips through the reader's sparse-store path.
  *
  * Scope matches the reader: little-endian float64 (`<f8`/`float64`), C
  * order, rank 2; v2 stores use flat "." keys with zlib or
  * blosc(lz4 + byte-shuffle) — zarr-python's default compressor, emitted
  * by the pure-JVM [[Blosc]] encoder; v3 stores (`format = 3`) write
  * `zarr.json` with a `[bytes, gzip|zstd, crc32c]` codec
  * chain and nested `c/r/c` default-encoded keys; with `shardInner` set,
  * v3 stores use the `sharding_indexed` codec instead — each chunk file
  * becomes a SHARD of gzip'd inner chunks plus a crc32c'd index footer,
  * with all-fill inner chunks omitted as missing sentinels (the sparse
  * case round-trips through the reader's fill path). Either store is
  * valid for any conforming reader of its format.
  */
object ZarrWriter {

  /** Write a rank-2 cube slice as `dir` with chunk shape (chunkR, chunkC).
    * `rowDim` labels map to array axis 0 DESCENDING (north-up when rowDim
    * is y), `colDim` ascending. Axis label sets are metadata-scale and are
    * the only driver-side collects.
    */
  def writeGrid(cube: DataCube, dir: String, rowDim: String = "y",
      colDim: String = "x", chunkR: Int = 256, chunkC: Int = 256,
      format: Int = 2, shardInner: Option[(Int, Int)] = None,
      compressor: String = "default", transposeF: Boolean = false): Unit = {
    require(format == 2 || format == 3, s"ZarrWriter: format $format")
    // v2 writes zlib (the reader-matrix baseline), blosc(lz4+byte-shuffle)
    // (zarr-python's DEFAULT, through the pure-JVM [[Blosc]] encoder) or
    // blosc(blosclz+bit-shuffle) (the r13 reader-matrix corner, for
    // write/read symmetry); v3 chains write gzip or zstd, both + crc32c,
    // optionally behind the `transpose` array->array codec (`transposeF`
    // stores chunks in F order with codec metadata order [1,0])
    val comp = if (compressor == "default")
      (if (format == 2) "zlib" else "gzip") else compressor
    require((format == 2 && Set("zlib", "blosc-lz4", "blosc-blosclz")(comp)) ||
      (format == 3 && Set("gzip", "zstd")(comp)),
      s"ZarrWriter: compressor $comp unsupported for v$format " +
        "(v2: zlib | blosc-lz4 | blosc-blosclz; v3: gzip | zstd)")
    require(shardInner.isEmpty || format == 3,
      "ZarrWriter: sharding is a v3 codec — set format = 3")
    require(!transposeF || (format == 3 && shardInner.isEmpty),
      "ZarrWriter: transpose is an unsharded v3 codec")
    shardInner.foreach { case (ir, ic) =>
      require(ir > 0 && ic > 0 && chunkR % ir == 0 && chunkC % ic == 0,
        s"ZarrWriter: inner chunk ($ir, $ic) must evenly divide the " +
          s"shard ($chunkR, $chunkC)")
    }
    require(cube.meta.dimNames.contains(rowDim) &&
      cube.meta.dimNames.contains(colDim),
      s"ZarrWriter: cube lacks $rowDim/$colDim dims")
    val extras = cube.meta.dimNames.filterNot(Set(rowDim, colDim))
    if (extras.nonEmpty) {
      val nz = cube.df.agg(countDistinct(
        struct(extras.map(col): _*))).first().getLong(0)
      require(nz <= 1, s"ZarrWriter: non-spatial dims ${extras.mkString(",")} " +
        s"carry $nz label combinations — reduce or filter first")
    }
    val spark = cube.df.sparkSession
    // axis labels: metadata-scale driver collects (same class as dim labels)
    val rows = cube.df.select(col(rowDim).cast("double")).distinct()
      .collect().map(_.getDouble(0)).sorted.reverse // row 0 = max label
    val cols = cube.df.select(col(colDim).cast("double")).distinct()
      .collect().map(_.getDouble(0)).sorted
    val (h, w) = (rows.length, cols.length)
    val rIdx = spark.sparkContext.broadcast(rows.zipWithIndex.toMap)
    val cIdx = spark.sparkContext.broadcast(cols.zipWithIndex.toMap)
    new java.io.File(dir).mkdirs()
    if (format == 2) {
      val compJson =
        if (comp == "blosc-lz4")
          """{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0}"""
        else if (comp == "blosc-blosclz")
          """{"id":"blosc","cname":"blosclz","clevel":5,"shuffle":2,"blocksize":0}"""
        else """{"id":"zlib","level":1}"""
      val zarray =
        s"""{"zarr_format":2,"shape":[$h,$w],"chunks":[$chunkR,$chunkC],
           |"dtype":"<f8","compressor":$compJson,
           |"fill_value":"NaN","filters":null,"order":"C"}""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, ".zarray"), zarray)
    } else {
      val codecEntry =
        if (comp == "zstd") """{"name":"zstd","configuration":{"level":3}}"""
        else """{"name":"gzip","configuration":{"level":1}}"""
      val codecJson = shardInner match {
        case Some((ir, ic)) =>
          s"""[{"name":"sharding_indexed","configuration":{
             |"chunk_shape":[$ir,$ic],
             |"codecs":[{"name":"bytes","configuration":{"endian":"little"}},
             |$codecEntry],
             |"index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},
             |{"name":"crc32c"}],
             |"index_location":"end"}}]""".stripMargin
        case None =>
          val tr = if (transposeF)
            """{"name":"transpose","configuration":{"order":[1,0]}},
              |""".stripMargin
          else ""
          s"""[$tr{"name":"bytes","configuration":{"endian":"little"}},
             |$codecEntry,
             |{"name":"crc32c"}]""".stripMargin
      }
      val zjson =
        s"""{"zarr_format":3,"node_type":"array","shape":[$h,$w],
           |"data_type":"float64",
           |"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[$chunkR,$chunkC]}},
           |"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},
           |"fill_value":"NaN",
           |"codecs":$codecJson,
           |"dimension_names":["$rowDim","$colDim"]}""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "zarr.json"), zjson)
    }
    // one shuffle: every chunk's cells land in one group; the task that
    // owns the group assembles, deflates and writes that chunk file
    val sess = spark
    import sess.implicits._
    val cells = cube.df.select(col(rowDim).cast("double").as("r"),
        col(colDim).cast("double").as("c"), col("value").cast("double"))
      .map { row =>
        val ri = rIdx.value(row.getDouble(0))
        val ci = cIdx.value(row.getDouble(1))
        (s"${ri / chunkR}.${ci / chunkC}",
          (ri % chunkR) * chunkC + (ci % chunkC), row.getDouble(2))
      }
    cells.groupByKey(_._1).mapGroups { (key, it) =>
      val buf = Array.fill(chunkR * chunkC)(Double.NaN)
      it.foreach { case (_, local, v) => buf(local) = v }
      // transpose codec: serialize the chunk in F order (order [1,0]);
      // the bytes codec then encodes the PERMUTED array
      val stored =
        if (!transposeF) buf
        else {
          val t = new Array[Double](buf.length)
          var ri = 0
          while (ri < chunkR) {
            var ci = 0
            while (ci < chunkC) {
              t(ci * chunkR + ri) = buf(ri * chunkC + ci)
              ci += 1
            }
            ri += 1
          }
          t
        }
      val bb = java.nio.ByteBuffer.allocate(stored.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      stored.foreach(bb.putDouble)
      def encV3(payload: Array[Byte]): Array[Byte] =
        if (comp == "zstd") Blosc.zstdCompress(payload)
        else {
          val out = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(out) {
            `def`.setLevel(1) // match the declared codec configuration
          }
          gz.write(payload); gz.close()
          out.toByteArray
        }
      def crcTrailer(payload: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32C()
        crc.update(payload, 0, payload.length)
        val withCrc = java.util.Arrays.copyOf(payload, payload.length + 4)
        java.nio.ByteBuffer.wrap(withCrc, payload.length, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(crc.getValue.toInt)
        withCrc
      }
      val bytes =
        if (format == 2 && comp == "blosc-lz4")
          Blosc.compress(bb.array(), typesize = 8, cname = "lz4",
            byteShuffle = true)
        else if (format == 2 && comp == "blosc-blosclz")
          Blosc.compress(bb.array(), typesize = 8, cname = "blosclz",
            byteShuffle = false, bitShuffle = true)
        else if (format == 2) {
          val d = new java.util.zip.Deflater(1)
          d.setInput(bb.array()); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
          d.end()
          out.toByteArray
        } else shardInner match {
          case None =>
            // v3 codec chain: bytes -> gzip|zstd -> crc32c trailer
            crcTrailer(encV3(bb.array()))
          case Some((ir, ic)) =>
            // sharding_indexed: gzip each inner chunk (all-fill inners
            // become missing sentinels), then the crc32c'd index footer
            val (gridR, gridC) = (chunkR / ir, chunkC / ic)
            val bodies = new java.io.ByteArrayOutputStream()
            val idx = java.nio.ByteBuffer.allocate(gridR * gridC * 16)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            for (gr <- 0 until gridR; gc <- 0 until gridC) {
              val inner = new Array[Double](ir * ic)
              var allNaN = true
              var f = 0
              while (f < inner.length) {
                val v = buf((gr * ir + f / ic) * chunkC + gc * ic + f % ic)
                inner(f) = v
                if (!v.isNaN) allNaN = false
                f += 1
              }
              if (allNaN) { idx.putLong(-1L); idx.putLong(-1L) }
              else {
                val ib = java.nio.ByteBuffer.allocate(inner.length * 8)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                inner.foreach(ib.putDouble)
                val enc = encV3(ib.array())
                idx.putLong(bodies.size().toLong)
                idx.putLong(enc.length.toLong)
                bodies.write(enc)
              }
            }
            bodies.write(crcTrailer(idx.array()))
            bodies.toByteArray
        }
      val path =
        if (format == 2) java.nio.file.Paths.get(dir, key)
        else {
          val Array(cr, cc) = key.split('.')
          val p = java.nio.file.Paths.get(dir, "c", cr, cc)
          java.nio.file.Files.createDirectories(p.getParent)
          p
        }
      java.nio.file.Files.write(path, bytes)
      key
    }.collect() // the action that drives the distributed writes
    ()
  }
}
