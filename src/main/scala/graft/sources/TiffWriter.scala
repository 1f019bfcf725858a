package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal classic-TIFF writer (public TIFF 6.0 layout): single-band
  * float32 little-endian raster, striped, uncompressed or
  * deflate-compressed. The inverse of the baseline [[TiffReader]] path —
  * what `save_result(format="GTiff")` sinks through, and what the STAC
  * driver fixture writes. Kept deliberately small: richer compression
  * variants exist for ingest (readers must meet data as it is); an EXPORT
  * can always choose the simplest spec-conformant encoding.
  */
object TiffWriter {

  /** Write `values` (row-major, row 0 = top) as a w×h float32 TIFF.
    * `rowsPerStrip <= 0` means one strip; `deflate` writes Compression=8
    * (zlib) strips — the COG-world default lossless codec.
    */
  def write(path: String, width: Int, height: Int, values: Array[Float],
      deflate: Boolean = false, rowsPerStrip: Int = 0): Unit = {
    require(width > 0 && height > 0 && values.length == width * height,
      s"TiffWriter: ${values.length} values for ${width}x$height")
    val rps = if (rowsPerStrip <= 0) height else math.min(rowsPerStrip, height)
    val strips: Seq[Array[Byte]] = (0 until height by rps).map { r0 =>
      val rows = math.min(rps, height - r0)
      val bb = ByteBuffer.allocate(rows * width * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      for (r <- r0 until r0 + rows; c <- 0 until width)
        bb.putFloat(values(r * width + c))
      if (deflate) deflateBytes(bb.array()) else bb.array()
    }
    val nStrips = strips.size
    val nEntries = 10
    val ifdOffset = 8
    val ifdEnd = ifdOffset + 2 + nEntries * 12 + 4
    // strip offset/count arrays live right after the IFD when they don't
    // fit inline (count > 1); single-strip files inline both values
    val (offArr, cntArr, dataOffset) =
      if (nStrips == 1) (0, 0, ifdEnd)
      else (ifdEnd, ifdEnd + 4 * nStrips, ifdEnd + 8 * nStrips)
    val stripOffsets = strips.scanLeft(dataOffset.toLong)(_ + _.length).init
    val total = dataOffset + strips.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    bb.putShort(nEntries.toShort)
    // tag, type (3=SHORT, 4=LONG), count, value — tags ascending per spec
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value.toInt)
    }
    entry(256, 4, 1, width)                          // ImageWidth
    entry(257, 4, 1, height)                         // ImageLength
    entry(258, 3, 1, 32)                             // BitsPerSample
    entry(259, 3, 1, if (deflate) 8 else 1)          // Compression
    entry(262, 3, 1, 1)                              // Photometric: BlackIsZero
    if (nStrips == 1) entry(273, 4, 1, stripOffsets.head) // StripOffsets
    else entry(273, 4, nStrips, offArr)
    entry(277, 3, 1, 1)                              // SamplesPerPixel
    entry(278, 4, 1, rps)                            // RowsPerStrip
    if (nStrips == 1) entry(279, 4, 1, strips.head.length) // StripByteCounts
    else entry(279, 4, nStrips, cntArr)
    entry(339, 3, 1, 3)                              // SampleFormat: IEEE float
    bb.putInt(0) // no next IFD
    if (nStrips > 1) {
      stripOffsets.foreach(o => bb.putInt(o.toInt))
      strips.foreach(s => bb.putInt(s.length))
    }
    strips.foreach(bb.put)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }

  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
