package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Baseline pure-JVM GeoTIFF/COG pixel reader (public TIFF 6.0 structure;
  * the reference reaches the same files through GDAL/rioxarray,
  * cubes/load.py:245-304).
  *
  * Scope — the subset that covers plain single-band rasters and the
  * full-resolution IFD of a COG: classic TIFF (II/MM), strip OR tile
  * layout, compression none(1)/deflate(8) (zlib — JDK-inflatable),
  * single-band AND chunky-interleaved multi-band rasters, integer
  * (8/16/32-bit signed/unsigned) and float (32/64) samples,
  * horizontal-differencing predictor(2) for integers. Out of scope
  * (clear errors): BigTIFF, JPEG/LZW/packbits compression, planar
  * (non-interleaved) band layout. Tile edge padding is clipped against
  * the image size, like the zarr reader.
  *
  * Distribution shape mirrors [[ZarrReader]]: the driver parses only the
  * kilobyte header/IFD into a SEGMENT TABLE (offset, byte count, position)
  * and each executor task seeks and decodes its own strips/tiles — no
  * driver data path, per-segment parallelism.
  */
object TiffReader {

  final case class Segment(index: Int, offset: Long, byteCount: Long)

  final case class TiffMeta(width: Int, height: Int, bits: Int,
      sampleFormat: Int, compression: Int, predictor: Int,
      littleEndian: Boolean,
      // strip layout: tileW = width, tileH = RowsPerStrip
      tileWidth: Int, tileHeight: Int, tilesAcross: Int,
      segments: Seq[Segment], nextIfd: Long = 0L, samplesPerPixel: Int = 1)

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long = {
    val (a0, a1, a2, a3) =
      (b(off) & 0xffL, b(off + 1) & 0xffL, b(off + 2) & 0xffL, b(off + 3) & 0xffL)
    if (le) a0 | (a1 << 8) | (a2 << 16) | (a3 << 24)
    else (a0 << 24) | (a1 << 16) | (a2 << 8) | a3
  }

  /** Parse the first IFD of a classic TIFF. Driver-side cost is METADATA
    * only: targeted range reads of the 8-byte header, the IFD, and any
    * out-of-line value arrays — never the raster bytes, so a 100 GB COG
    * costs the driver kilobytes (the IFD of a COG sits at the front by
    * construction; plain TIFFs may place it at the end, still one seek).
    */
  def readMeta(path: String): TiffMeta = readMetaAll(path).head

  /** The full IFD chain — a COG carries its overview pyramid as chained
    * IFDs (level 0 = full resolution, then progressively reduced copies).
    * Each is parsed with the same targeted range reads.
    */
  def readMetaAll(path: String): Seq[TiffMeta] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      var out = List(readMeta(raf, None))
      while (out.head.nextIfd != 0)
        out = readMeta(raf, Some(out.head)) :: out
      out.reverse
    } finally raf.close()
  }

  private def readMeta(raf: java.io.RandomAccessFile,
      after: Option[TiffMeta]): TiffMeta = {
    def readAt(off: Long, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      raf.seek(off)
      raf.readFully(b)
      b
    }
    require(raf.length() >= 8, "TiffCorrupt: short file")
    val head = readAt(0, 8)
    val le =
      if (head(0) == 'I'.toByte && head(1) == 'I'.toByte) true
      else if (head(0) == 'M'.toByte && head(1) == 'M'.toByte) false
      else throw new IllegalArgumentException("TiffCorrupt: bad byte-order mark")
    val magic = u16(head, 2, le)
    require(magic != 43, "TiffUnsupported: BigTIFF")
    require(magic == 42, s"TiffCorrupt: magic $magic")
    val ifdOff = after.map(_.nextIfd).getOrElse(u32(head, 4, le))
    val n = u16(readAt(ifdOff, 2), 0, le)
    val ifd = readAt(ifdOff + 2, n * 12)
    // tag → (type, count, the entry's raw 4-byte value/offset field)
    var tags = Map.empty[Int, (Int, Long, Array[Byte])]
    for (i <- 0 until n) {
      val e = i * 12
      tags += u16(ifd, e, le) ->
        ((u16(ifd, e + 2, le), u32(ifd, e + 4, le), ifd.slice(e + 8, e + 12)))
    }
    def values(tag: Int): Seq[Long] = tags.get(tag) match {
      case None => Nil
      case Some((typ, count, vfield)) =>
        val sz = typ match {
          case 3 => 2 // SHORT
          case 4 => 4 // LONG
          case _ => throw new IllegalArgumentException(
            s"TiffUnsupported: field type $typ for tag $tag")
        }
        val total = sz * count.toInt
        val arr = if (total <= 4) vfield else readAt(u32(vfield, 0, le), total)
        (0 until count.toInt).map { i =>
          if (sz == 2) u16(arr, 2 * i, le).toLong else u32(arr, 4 * i, le)
        }
    }
    def one(tag: Int, default: => Long): Long =
      values(tag).headOption.getOrElse(default)

    val width = one(256, throw new IllegalArgumentException("TiffCorrupt: no width")).toInt
    val height = one(257, throw new IllegalArgumentException("TiffCorrupt: no height")).toInt
    val bits = one(258, 1).toInt
    val compression = one(259, 1).toInt
    val samplesPerPixel = one(277, 1).toInt
    val sampleFormat = one(339, 1).toInt
    val predictor = one(317, 1).toInt
    val planarConfig = one(284, 1).toInt
    require(samplesPerPixel == 1 || planarConfig == 1,
      "TiffUnsupported: planar (non-interleaved) multi-band layout")
    require(compression == 1 || compression == 8,
      s"TiffUnsupported: compression $compression (none/deflate only)")
    require(predictor == 1 || predictor == 2,
      s"TiffUnsupported: predictor $predictor")

    val tiled = tags.contains(322)
    val (tw, th, offsets, counts) =
      if (tiled)
        (one(322, 0).toInt, one(323, 0).toInt, values(324), values(325))
      else {
        val rps = math.min(one(278, height.toLong), height.toLong).toInt
        (width, rps, values(273), values(279))
      }
    require(offsets.nonEmpty && offsets.size == counts.size,
      "TiffCorrupt: strip/tile tables")
    val across = if (tiled) (width + tw - 1) / tw else 1
    val segs = offsets.zip(counts).zipWithIndex.map { case ((o, c), i) =>
      Segment(i, o, c)
    }
    val nextIfd = u32(readAt(ifdOff + 2 + n * 12, 4), 0, le)
    TiffMeta(width, height, bits, sampleFormat, compression, predictor, le,
      tw, th, across, segs, nextIfd, samplesPerPixel)
  }

  /** Decode one segment's raw bytes to doubles (executor-side). */
  def unpack(raw: Array[Byte], m: TiffMeta): Array[Double] = {
    val bytes = if (m.compression == 8) ZarrReader.inflate(raw) else raw
    val per = m.bits / 8
    val n = bytes.length / per
    val bb = java.nio.ByteBuffer.wrap(bytes).order(
      if (m.littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    (m.sampleFormat, m.bits) match {
      case (3, 32) => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case (3, 64) => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      case (2, 16) => while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
      case (2, 32) => while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
      case (1, 8) => while (i < n) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
      case (1, 16) => while (i < n) { out(i) = (u16(bytes, i * 2, m.littleEndian)).toDouble; i += 1 }
      case (1, 32) => while (i < n) { out(i) = u32(bytes, i * 4, m.littleEndian).toDouble; i += 1 }
      case (f, w) => throw new IllegalArgumentException(
        s"TiffUnsupported: sample format $f / $w bits")
    }
    if (m.predictor == 2) {
      // horizontal differencing: undo per row, per SAMPLE channel (chunky
      // interleave differences each channel against the previous pixel's)
      require(m.sampleFormat != 3, "TiffUnsupported: predictor 2 on floats")
      val spp = m.samplesPerPixel
      val w = m.tileWidth * spp
      var r = 0
      while (r * w < n) {
        var c = spp
        while (c < w && r * w + c < n) {
          out(r * w + c) += out(r * w + c - spp)
          c += 1
        }
        r += 1
      }
    }
    out
  }

  /** Load the raster as a long-form DataFrame (row, col, value), one
    * executor task per group of segments, each seeking only its own bytes.
    * `level` selects an overview IFD of a COG pyramid (0 = full
    * resolution) — reading a reduced copy touches only ITS segments, the
    * cloud-optimized cheap-zoom path.
    */
  def loadArray(spark: SparkSession, path: String,
      dimNames: Seq[String] = Seq("row", "col"), level: Int = 0): DataFrame = {
    val all = readMetaAll(path)
    require(level >= 0 && level < all.size,
      s"TiffCorrupt: overview level $level of ${all.size}")
    val meta = all(level)
    require(meta.samplesPerPixel == 1,
      "TiffUnsupported: multi-band raster — use loadArrayBands")
    val bMeta = spark.sparkContext.broadcast(meta)
    val bPath = spark.sparkContext.broadcast(path)
    import spark.implicits._
    val rows = spark.createDataset(meta.segments)
      .repartition(math.min(meta.segments.size, 64))
      .mapPartitions { it =>
        val m = bMeta.value
        val raf = new java.io.RandomAccessFile(bPath.value, "r")
        val segs = it.toArray
        val out = segs.iterator.flatMap { seg =>
          val raw = new Array[Byte](seg.byteCount.toInt)
          raf.seek(seg.offset)
          raf.readFully(raw)
          val vals = unpack(raw, m)
          val (tileRow, tileCol) = (seg.index / m.tilesAcross, seg.index % m.tilesAcross)
          val (baseR, baseC) = (tileRow * m.tileHeight, tileCol * m.tileWidth)
          vals.indices.iterator.flatMap { flat =>
            val r = baseR + flat / m.tileWidth
            val c = baseC + flat % m.tileWidth
            if (r < m.height && c < m.width) Some((r.toLong, c.toLong, vals(flat)))
            else None // tile edge padding, clipped like zarr
          }
        }.toArray
        raf.close()
        out.iterator
      }
      .toDF(dimNames.head, dimNames(1), "value")
    rows
  }

  /** Multi-band (chunky-interleaved) variant: one row per (row, col, band)
    * sample. Same segment fan-out; the flat sample index decomposes as
    * pixel·spp + band.
    */
  def loadArrayBands(spark: SparkSession, path: String,
      level: Int = 0): DataFrame = {
    val all = readMetaAll(path)
    require(level >= 0 && level < all.size,
      s"TiffCorrupt: overview level $level of ${all.size}")
    val meta = all(level)
    val bMeta = spark.sparkContext.broadcast(meta)
    val bPath = spark.sparkContext.broadcast(path)
    import spark.implicits._
    spark.createDataset(meta.segments)
      .repartition(math.min(meta.segments.size, 64))
      .mapPartitions { it =>
        val m = bMeta.value
        val raf = new java.io.RandomAccessFile(bPath.value, "r")
        val spp = m.samplesPerPixel
        val out = it.toArray.iterator.flatMap { seg =>
          val raw = new Array[Byte](seg.byteCount.toInt)
          raf.seek(seg.offset)
          raf.readFully(raw)
          val vals = unpack(raw, m)
          val (tileRow, tileCol) = (seg.index / m.tilesAcross, seg.index % m.tilesAcross)
          val (baseR, baseC) = (tileRow * m.tileHeight, tileCol * m.tileWidth)
          vals.indices.iterator.flatMap { flat =>
            val pixel = flat / spp
            val band = flat % spp
            val r = baseR + pixel / m.tileWidth
            val c = baseC + pixel % m.tileWidth
            if (r < m.height && c < m.width)
              Some((r.toLong, c.toLong, band, vals(flat)))
            else None
          }
        }.toArray
        raf.close()
        out.iterator
      }
      .toDF("row", "col", "band", "value")
  }
}
