package graft.pipeline

/** Minimal MPEG-2 video encoder (ISO/IEC 13818-2 / ITU-T H.262) — the
  * write-side twin of [[Mpeg2]], the same role [[Mpeg1Writer]] plays for
  * the 11172-2 decoder: VALID elementary streams with closed-form pixel
  * outcomes, so the driver's hash gate can check an encode → mux →
  * demux → decode round trip end to end. Produces sequence header +
  * sequence_extension (progressive 4:2:0 Main@Main), picture headers with
  * their picture_coding_extension, and four picture shapes:
  *
  *  - I: uniform gray, DC-only blocks (intra DC is quantised by the DC
  *    precision multiplier alone, so the default intra matrix is fine);
  *  - P: zero-MV coded-pattern macroblocks lifting every luma pel by
  *    exactly `delta` — escape-coded level 4·δ dequants under the default
  *    flat-16 non-intra matrix at qs = 2 to F = 8δ+1 (odd: no mismatch
  *    toggle), a flat residual of δ+1/8 that rounds to +δ;
  *  - B: zero-MV interpolated, no coefficients — the decoder's rounded
  *    bidirectional average;
  *  - field-DCT I (frame_pred_frame_dct = 0, dct_type = 1): the two
  *    FIELDS at different grays, so even/odd lines interleave — crossing
  *    the 13818-2 field-DCT organisation under the same gate.
  *
  * Escape levels are kept above B.14's largest run-0 codeword (40), where
  * the 13818-2 escape (6-bit run + 12-bit signed level) is the encoding
  * the spec itself prescribes.
  */
object Mpeg2Writer {

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def put(bit: Int): this.type = {
      cur = (cur << 1) | bit; nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
      this
    }
    def b(s: String): this.type = { s.foreach(c => put(c - '0')); this }
    def bits(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1); i -= 1 }
      this
    }
    def align(): this.type = { while (nb != 0) put(0); this }
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  // dct_dc_size VLCs, encoder direction (13818-2 tables B.12/B.13 —
  // bit-identical to 11172-2 B.5a/B.5b in the sizes used here)
  private val DcSizeLuma = Array(
    "100", "00", "01", "101", "110", "1110", "11110", "111110", "1111110")
  private val DcSizeChroma = Array(
    "00", "01", "10", "110", "1110", "11110", "111110", "1111110", "11111110")

  private def putDc(w: BitWriter, diff: Int, luma: Boolean): Unit = {
    val size = 32 - Integer.numberOfLeadingZeros(math.abs(diff)) // 0 for 0
    w.b(if (luma) DcSizeLuma(size) else DcSizeChroma(size))
    if (size > 0)
      w.bits(if (diff > 0) diff else diff + (1 << size) - 1, size)
  }

  private def startCode(xx: Int)(w: BitWriter): Unit = {
    w.align(); w.bits(0, 8).bits(0, 8).bits(1, 8).bits(xx, 8)
  }

  /** sequence header (default quantiser matrices) + sequence_extension:
    * progressive, Main@Main, no size extensions. `chroma` 1 = 4:2:0,
    * 2 = 4:2:2.
    */
  private def seqHeaders(w: BitWriter, width: Int, height: Int,
      chroma: Int = 1): Unit = {
    startCode(0xb3)(w)
    w.bits(width, 12).bits(height, 12)
      .bits(1, 4).bits(1, 4) // aspect, frame_rate
      .bits(0x3ffff, 18).put(1) // bit_rate (low 18), marker
      .bits(0, 10).put(0) // vbv, constrained
      .put(0).put(0) // default quantiser matrices
    startCode(0xb5)(w)
    w.bits(1, 4) // extension id: Sequence Extension
      .bits(0x48, 8) // profile_and_level: Main@Main
      .put(1) // progressive_sequence
      .bits(chroma, 2) // chroma_format
      .bits(0, 2).bits(0, 2) // size extensions
      .bits(0, 12).put(1) // bit_rate_extension + marker
      .bits(0, 8).put(0) // vbv_buffer_size_extension + low_delay
      .bits(0, 2).bits(0, 5) // frame_rate extensions
  }

  /** picture header (the 11172-era full_pel/f_code fields pinned to
    * 0/'111' as 13818-2 §6.3.10 requires) + picture_coding_extension.
    */
  private def picHeaders(w: BitWriter, ptype: Int, fc: Seq[Int],
      fpfd: Int = 1): Unit = {
    startCode(0x00)(w)
    w.bits(0, 10).bits(ptype, 3).bits(0xffff, 16)
    if (ptype >= 2) { w.put(0); w.bits(7, 3) } // full_pel 0, f_code '111'
    if (ptype == 3) { w.put(0); w.bits(7, 3) }
    w.put(0) // extra_bit_picture
    startCode(0xb5)(w)
    w.bits(8, 4) // extension id: Picture Coding Extension
    fc.foreach(f => w.bits(f, 4))
    w.bits(0, 2) // intra_dc_precision: 8 bits
      .bits(3, 2) // picture_structure: frame
      .put(0) // top_field_first
      .bits(fpfd, 1) // frame_pred_frame_dct
      .put(0) // concealment_motion_vectors
      .put(0) // q_scale_type: linear
      .put(0) // intra_vlc_format: B.14
      .put(0) // alternate_scan
      .put(0).put(1).put(1).put(0) // repeat_first/chroma420/progressive/composite
  }

  /** DC-only uniform-gray I slice (one slice per picture). `nBlocks` is
    * 6 for 4:2:0, 8 for 4:2:2 (the second Cb/Cr pair).
    */
  private def iSlice(w: BitWriter, width: Int, height: Int,
      gray: Int, nBlocks: Int = 6): Unit = {
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    startCode(0x01)(w)
    w.bits(8, 5).put(0) // quantiser_scale_code (unused: DC-only), extras 0
    val nMb = ((width + 15) / 16) * ((height + 15) / 16)
    for (mb <- 0 until nMb) {
      w.b("1").b("1") // address_increment 1, macroblock_type intra
      for (blk <- 0 until nBlocks) {
        val diff = if (mb == 0 && blk == 0) gray - 128 else 0
        putDc(w, diff, luma = blk < 4)
        w.b("10") // EOB
      }
    }
  }

  /** P slice: every macroblock coded-pattern-only (zero-MV frame
    * prediction), the four luma blocks each one escape-coded DC residual
    * of level 4·delta at qs = 2 — per-pel +delta exactly (see object doc).
    */
  private def pSlice(w: BitWriter, width: Int, height: Int,
      delta: Int, c422: Boolean = false): Unit = {
    require(delta >= 11 && delta <= 31, s"delta outside 11..31: $delta")
    startCode(0x01)(w)
    w.bits(1, 5).put(0) // quantiser_scale_code 1 -> qs 2
    val nMb = ((width + 15) / 16) * ((height + 15) / 16)
    for (_ <- 0 until nMb) {
      w.b("1").b("01") // address_increment 1, type: coded_pattern only
      w.b("111") // cbp 60: Y0..Y3 carry coefficients, chroma none
      if (c422) w.b("00") // coded_block_pattern_1: blocks 6/7 uncoded
      for (_ <- 0 until 4) {
        // 13818-2 escape: 6-bit run + 12-bit SIGNED level
        w.b("000001").bits(0, 6).bits(4 * delta, 12)
        w.b("10") // EOB
      }
    }
  }

  /** B slice: every macroblock interpolated with zero motion and no
    * coefficients — exactly (past + future + 1) >> 1 per pel.
    */
  private def bSlice(w: BitWriter, width: Int, height: Int): Unit = {
    startCode(0x01)(w)
    w.bits(8, 5).put(0) // quantiser_scale_code (unused)
    val nMb = ((width + 15) / 16) * ((height + 15) / 16)
    for (_ <- 0 until nMb) {
      w.b("1").b("10") // address_increment 1, type: interpolated not coded
      w.b("1").b("1").b("1").b("1") // four motion codes 0 (f_code 1)
    }
  }

  /** Field-DCT I slice (caller emits fpfd = 0 headers): every macroblock
    * intra with dct_type = 1, the TOP field at `grayTop` and the BOTTOM
    * field at `grayBottom` — even/odd lines interleave, which a frame-DCT
    * organisation could not produce from these blocks.
    */
  private def fieldSlice(w: BitWriter, width: Int, height: Int,
      grayTop: Int, grayBottom: Int): Unit = {
    startCode(0x01)(w)
    w.bits(8, 5).put(0)
    val nMb = ((width + 15) / 16) * ((height + 15) / 16)
    var pred = 128 // DC predictor persists across the slice's macroblocks
    for (_ <- 0 until nMb) {
      w.b("1").b("1") // address_increment 1, macroblock_type intra
      w.put(1) // dct_type = 1 (field DCT) — macroblock_modes() position
      for (blk <- 0 until 6) {
        if (blk < 4) {
          val target = if (blk < 2) grayTop else grayBottom
          putDc(w, target - pred, luma = true)
          pred = target
          w.b("10")
        } else { putDc(w, 0, luma = false); w.b("10") }
      }
    }
  }

  /** STREAM-order access units crossing all three picture classes plus
    * the field-DCT organisation: I at `gray`, P lifting it to gray+delta,
    * B interpolating the two ((2·gray+delta+1) >> 1), and a field-DCT I
    * whose even lines sit at `gray` and odd lines at gray+2·delta (mean
    * gray+delta). AU 0 carries the sequence header + extension.
    */
  def ipbfPictures(width: Int, height: Int, gray: Int,
      delta: Int): Seq[Array[Byte]] = {
    require(gray + 2 * delta <= 255, s"field gray overflows: $gray + 2*$delta")
    val i = {
      val w = new BitWriter
      seqHeaders(w, width, height)
      picHeaders(w, 1, fc = Seq(15, 15, 15, 15))
      iSlice(w, width, height, gray)
      w.bytes
    }
    val p = {
      val w = new BitWriter
      picHeaders(w, 2, fc = Seq(1, 1, 15, 15))
      pSlice(w, width, height, delta)
      w.bytes
    }
    val b = {
      val w = new BitWriter
      picHeaders(w, 3, fc = Seq(1, 1, 1, 1))
      bSlice(w, width, height)
      w.bytes
    }
    val fld = {
      val w = new BitWriter
      picHeaders(w, 1, fc = Seq(15, 15, 15, 15), fpfd = 0)
      fieldSlice(w, width, height, gray, gray + 2 * delta)
      w.bytes
    }
    Seq(i, p, b, fld)
  }

  /** STREAM-order 4:2:2 I → P → B access units: the eight-block
    * macroblock, coded_block_pattern_1, half-width full-height chroma —
    * same closed-form luma outcomes as [[ipbfPictures]]'s first three.
    */
  def ipb422Pictures(width: Int, height: Int, gray: Int,
      delta: Int): Seq[Array[Byte]] = {
    val i = {
      val w = new BitWriter
      seqHeaders(w, width, height, chroma = 2)
      picHeaders(w, 1, fc = Seq(15, 15, 15, 15))
      iSlice(w, width, height, gray, nBlocks = 8)
      w.bytes
    }
    val p = {
      val w = new BitWriter
      picHeaders(w, 2, fc = Seq(1, 1, 15, 15))
      pSlice(w, width, height, delta, c422 = true)
      w.bytes
    }
    val b = {
      val w = new BitWriter
      picHeaders(w, 3, fc = Seq(1, 1, 1, 1))
      bSlice(w, width, height)
      w.bytes
    }
    Seq(i, p, b)
  }
}
