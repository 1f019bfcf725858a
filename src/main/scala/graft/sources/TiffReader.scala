package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM GeoTIFF/COG pixel reader (public TIFF 6.0 + BigTIFF structure;
  * the reference reaches the same files through GDAL/rioxarray,
  * cubes/load.py:245-304).
  *
  * Scope: classic TIFF (II/MM) AND BigTIFF (magic 43, 8-byte IFD walk),
  * strip OR tile layout, compression none(1)/LZW(5)/JPEG(7, via the JDK's
  * own decoder, with JPEGTables splicing)/deflate(8)/PackBits(32773),
  * chunky-interleaved AND planar (band-separate) multi-band rasters,
  * integer (8/16/32-bit signed/unsigned) and float (32/64) samples,
  * horizontal-differencing predictor(2) for integers. Out of scope
  * (clear errors): old-style JPEG(6), CCITT fax codecs. Tile edge padding
  * is clipped against the image size, like the zarr reader.
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
      segments: Seq[Segment], nextIfd: Long = 0L, samplesPerPixel: Int = 1,
      // PlanarConfiguration=2: each segment carries ONE band's samples and
      // the segment table is band-major (all of band 0's strips, then band
      // 1's, …) — spp × segsPerBand segments total
      planar: Boolean = false,
      // JPEGTables (tag 347): shared quantization/Huffman tables to splice
      // into each strip's abbreviated JPEG stream
      jpegTables: Option[Array[Byte]] = None)

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long = {
    val (a0, a1, a2, a3) =
      (b(off) & 0xffL, b(off + 1) & 0xffL, b(off + 2) & 0xffL, b(off + 3) & 0xffL)
    if (le) a0 | (a1 << 8) | (a2 << 16) | (a3 << 24)
    else (a0 << 24) | (a1 << 16) | (a2 << 8) | a3
  }

  private def u64(b: Array[Byte], off: Int, le: Boolean): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val by = b(off + (if (le) 7 - i else i)) & 0xffL
      v = (v << 8) | by
      i += 1
    }
    v
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
    val head = readAt(0, math.min(raf.length(), 16L).toInt)
    val le =
      if (head(0) == 'I'.toByte && head(1) == 'I'.toByte) true
      else if (head(0) == 'M'.toByte && head(1) == 'M'.toByte) false
      else throw new IllegalArgumentException("TiffCorrupt: bad byte-order mark")
    val magic = u16(head, 2, le)
    // BigTIFF (magic 43): 8-byte offsets everywhere — the same IFD walk with
    // a 16-byte header, 8-byte entry counts, 20-byte entries, LONG8 type
    val big = magic == 43
    require(big || magic == 42, s"TiffCorrupt: magic $magic")
    val (inline, entrySize) = if (big) (8, 20) else (4, 12)
    val firstIfd =
      if (big) {
        require(head.length >= 16 && u16(head, 4, le) == 8 && u16(head, 6, le) == 0,
          "TiffCorrupt: BigTIFF offset size")
        u64(head, 8, le)
      } else u32(head, 4, le)
    val ifdOff = after.map(_.nextIfd).getOrElse(firstIfd)
    val n =
      if (big) u64(readAt(ifdOff, 8), 0, le).toInt
      else u16(readAt(ifdOff, 2), 0, le)
    val entBase = ifdOff + (if (big) 8 else 2)
    val ifd = readAt(entBase, n * entrySize)
    // tag → (type, count, the entry's raw inline value/offset field)
    var tags = Map.empty[Int, (Int, Long, Array[Byte])]
    for (i <- 0 until n) {
      val e = i * entrySize
      val count = if (big) u64(ifd, e + 4, le) else u32(ifd, e + 4, le)
      val vOff = e + (if (big) 12 else 8)
      tags += u16(ifd, e, le) ->
        ((u16(ifd, e + 2, le), count, ifd.slice(vOff, vOff + inline)))
    }
    def typeSize(typ: Int, tag: Int): Int = typ match {
      case 1 | 2 | 6 | 7 => 1 // BYTE / ASCII / SBYTE / UNDEFINED
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case 16 => 8 // LONG8 (BigTIFF)
      case _ => throw new IllegalArgumentException(
        s"TiffUnsupported: field type $typ for tag $tag")
    }
    def raw(tag: Int): Option[(Int, Long, Array[Byte])] = tags.get(tag).map {
      case (typ, count, vfield) =>
        val total = typeSize(typ, tag) * count.toInt
        val arr =
          if (total <= inline) vfield
          else readAt(if (big) u64(vfield, 0, le) else u32(vfield, 0, le), total)
        (typ, count, arr)
    }
    def values(tag: Int): Seq[Long] = raw(tag) match {
      case None => Nil
      case Some((typ, count, arr)) =>
        val sz = typeSize(typ, tag)
        (0 until count.toInt).map { i =>
          sz match {
            case 1 => (arr(i) & 0xff).toLong
            case 2 => u16(arr, 2 * i, le).toLong
            case 4 => u32(arr, 4 * i, le)
            case 8 => u64(arr, 8 * i, le)
          }
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
    require(planarConfig == 1 || planarConfig == 2,
      s"TiffCorrupt: planar configuration $planarConfig")
    require(Set(1, 5, 7, 8, 32773).contains(compression),
      s"TiffUnsupported: compression $compression " +
        "(none/LZW/JPEG/deflate/PackBits only)")
    require(predictor == 1 || predictor == 2,
      s"TiffUnsupported: predictor $predictor")
    val planar = samplesPerPixel > 1 && planarConfig == 2
    val jpegTables =
      if (compression == 7) raw(347).map(_._3.take(tags(347)._2.toInt))
      else None

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
    val nextOff = entBase + n.toLong * entrySize
    val nextIfd =
      if (big) u64(readAt(nextOff, 8), 0, le) else u32(readAt(nextOff, 4), 0, le)
    TiffMeta(width, height, bits, sampleFormat, compression, predictor, le,
      tw, th, across, segs, nextIfd, samplesPerPixel, planar, jpegTables)
  }

  /** TIFF-flavor LZW decode (TIFF 6.0 §13): 8-bit symbols, MSB-first code
    * packing, ClearCode 256 / EOI 257, and the spec's EARLY code-width
    * change — the width grows to 10/11/12 bits when the next free table
    * entry reaches 511/1023/2047 (one position before a late-change LZW
    * would), matching what every TIFF writer emits.
    */
  private[graft] def lzwDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 3))
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 0
    def reset(): Unit = {
      var i = 0
      while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
      dictSize = 258
    }
    reset()
    var codeLen = 9
    var bitPos = 0L
    val totalBits = in.length.toLong * 8
    def next(): Int = {
      if (bitPos + codeLen > totalBits) 257 // truncated stream = implicit EOI
      else {
        var v = 0
        var i = 0
        while (i < codeLen) {
          v = (v << 1) | ((in((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1)
          bitPos += 1
          i += 1
        }
        v
      }
    }
    var prev: Array[Byte] = null
    var c = next()
    while (c != 257) {
      if (c == 256) { reset(); codeLen = 9; prev = null }
      else {
        val entry: Array[Byte] =
          if (c < dictSize && dict(c) != null) dict(c)
          else if (c == dictSize && prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException(
            s"TiffCorrupt: LZW code $c with table size $dictSize")
        out.write(entry, 0, entry.length)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0)
          dictSize += 1
        }
        prev = entry
        if (dictSize >= (1 << codeLen) - 1 && codeLen < 12) codeLen += 1
      }
      c = next()
    }
    out.toByteArray
  }

  /** PackBits decode (TIFF 6.0 §9): n≥0 → n+1 literal bytes; −127…−1 →
    * repeat next byte 1−n times; −128 → no-op.
    */
  private[graft] def packbitsDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 2))
    var i = 0
    while (i < in.length) {
      val n = in(i)
      i += 1
      if (n >= 0) { out.write(in, i, n + 1); i += n + 1 }
      else if (n != -128) {
        val b = in(i); i += 1
        var k = 1 - n
        while (k > 0) { out.write(b); k -= 1 }
      }
    }
    out.toByteArray
  }

  /** Decode one JPEG-compressed segment through the JDK's own JPEG decoder.
    * A strip is an abbreviated JPEG stream; shared tables from JPEGTables
    * (tag 347: SOI + tables + EOI) are spliced in after the strip's SOI.
    * Output is laid out like every other segment (tileWidth-stride, chunky),
    * zero-padded past the decoded extent (clipped by the caller anyway).
    */
  private def jpegSamples(rawSeg: Array[Byte], m: TiffMeta): Array[Double] = {
    val stream = m.jpegTables match {
      case Some(t) if t.length > 4 && rawSeg.length > 2 =>
        val body = t.slice(2, t.length - 2) // strip the tables' own SOI/EOI
        val merged = new Array[Byte](2 + body.length + (rawSeg.length - 2))
        merged(0) = rawSeg(0); merged(1) = rawSeg(1)
        System.arraycopy(body, 0, merged, 2, body.length)
        System.arraycopy(rawSeg, 2, merged, 2 + body.length, rawSeg.length - 2)
        merged
      case _ => rawSeg
    }
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stream))
    require(img != null, "TiffCorrupt: undecodable JPEG segment")
    val raster = img.getRaster
    val spp = if (m.planar) 1 else m.samplesPerPixel
    val out = new Array[Double](m.tileHeight * m.tileWidth * spp)
    val h = math.min(raster.getHeight, m.tileHeight)
    val w = math.min(raster.getWidth, m.tileWidth)
    val bands = math.min(raster.getNumBands, spp)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) {
          out((y * m.tileWidth + x) * spp + b) = raster.getSampleDouble(x, y, b)
          b += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode one segment's raw bytes to doubles (executor-side). */
  def unpack(raw: Array[Byte], m: TiffMeta): Array[Double] = {
    if (m.compression == 7) return jpegSamples(raw, m)
    val bytes = m.compression match {
      case 8 => ZarrReader.inflate(raw)
      case 5 => lzwDecode(raw)
      case 32773 => packbitsDecode(raw)
      case _ => raw
    }
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
      // interleave differences each channel against the previous pixel's;
      // a planar segment carries one channel, so its stride is 1)
      require(m.sampleFormat != 3, "TiffUnsupported: predictor 2 on floats")
      val spp = if (m.planar) 1 else m.samplesPerPixel
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

  /** Multi-band variant: one row per (row, col, band) sample. Same segment
    * fan-out. Chunky interleave decomposes the flat sample index as
    * pixel·spp + band; planar layout derives the band from the segment's
    * position in the band-major segment table (each planar segment is a
    * single-channel raster).
    */
  def loadArrayBands(spark: SparkSession, path: String,
      level: Int = 0): DataFrame = {
    val all = readMetaAll(path)
    require(level >= 0 && level < all.size,
      s"TiffCorrupt: overview level $level of ${all.size}")
    val meta = all(level)
    require(!meta.planar || meta.segments.size % meta.samplesPerPixel == 0,
      "TiffCorrupt: planar segment table not divisible by band count")
    val bMeta = spark.sparkContext.broadcast(meta)
    val bPath = spark.sparkContext.broadcast(path)
    import spark.implicits._
    spark.createDataset(meta.segments)
      .repartition(math.min(meta.segments.size, 64))
      .mapPartitions { it =>
        val m = bMeta.value
        val raf = new java.io.RandomAccessFile(bPath.value, "r")
        val spp = m.samplesPerPixel
        val segsPerBand = if (m.planar) m.segments.size / spp else m.segments.size
        val out = it.toArray.iterator.flatMap { seg =>
          val raw = new Array[Byte](seg.byteCount.toInt)
          raf.seek(seg.offset)
          raf.readFully(raw)
          val vals = unpack(raw, m)
          val (planarBand, within) =
            if (m.planar) (seg.index / segsPerBand, seg.index % segsPerBand)
            else (0, seg.index)
          val perPixel = if (m.planar) 1 else spp
          val (tileRow, tileCol) = (within / m.tilesAcross, within % m.tilesAcross)
          val (baseR, baseC) = (tileRow * m.tileHeight, tileCol * m.tileWidth)
          vals.indices.iterator.flatMap { flat =>
            val pixel = flat / perPixel
            val band = if (m.planar) planarBand else flat % spp
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
