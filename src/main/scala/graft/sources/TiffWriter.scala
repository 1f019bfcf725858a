package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal classic-TIFF writer (public TIFF 6.0 layout): single-band
  * float32 little-endian raster, uncompressed, one strip. The inverse of
  * the baseline [[TiffReader]] path — what `save_result(format="GTiff")`
  * sinks through. Kept deliberately small: compression variants exist for
  * ingest (readers must meet data as it is); an EXPORT can always choose
  * the simplest spec-conformant encoding.
  */
object TiffWriter {

  /** Write `values` (row-major, row 0 = top) as a w×h float32 TIFF. */
  def write(path: String, width: Int, height: Int,
      values: Array[Float]): Unit = {
    require(width > 0 && height > 0 && values.length == width * height,
      s"TiffWriter: ${values.length} values for ${width}x$height")
    // tag, type (3=SHORT, 4=LONG), count, value
    val dataBytes = width * height * 4
    val nEntries = 10
    val ifdOffset = 8
    val dataOffset = ifdOffset + 2 + nEntries * 12 + 4
    val entries: Seq[(Int, Int, Int)] = Seq(
      (256, 4, width),       // ImageWidth
      (257, 4, height),      // ImageLength
      (258, 3, 32),          // BitsPerSample
      (259, 3, 1),           // Compression: none
      (262, 3, 1),           // Photometric: BlackIsZero
      (273, 4, dataOffset),  // StripOffsets (single strip)
      (277, 3, 1),           // SamplesPerPixel
      (278, 4, height),      // RowsPerStrip (single strip)
      (279, 4, dataBytes),   // StripByteCounts
      (339, 3, 3))           // SampleFormat: IEEE float
    val bb = ByteBuffer.allocate(dataOffset + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    bb.putShort(nEntries.toShort)
    entries.foreach { case (tag, typ, value) =>
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
      if (typ == 3) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value)
    }
    bb.putInt(0) // no next IFD
    values.foreach(bb.putFloat)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }
}
