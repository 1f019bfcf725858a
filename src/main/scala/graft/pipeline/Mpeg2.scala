package graft.pipeline

/** MPEG-2 video INTRA decode (ISO/IEC 13818-2 / ITU-T H.262) — the delta
  * over the complete 11172-2 machinery in [[Mpeg1]], for I frame-pictures:
  * sequence_extension / picture_coding_extension parsing, configurable
  * intra DC precision (8–11 bits, with the extended B.12/B.13 dct_dc_size
  * codes), linear AND non-linear quantiser_scale mappings (Table 7-6),
  * the alternate scan (Figure 7-3), the 12-bit signed escape form, the
  * /32 intra dequantisation, and MISMATCH CONTROL (§7.4.4 — the LSB of
  * F[7][7] toggles when the coefficient sum is even) in place of MPEG-1's
  * per-coefficient oddification.
  *
  * Declared boundaries (decode returns None, never wrong pixels): field
  * pictures and field DCT, intra_vlc_format = 1 (Table B.15),
  * concealment motion vectors, chroma formats other than 4:2:0, and
  * P/B-pictures (the full 13818-2 inter machinery — dual-prime, 16×8 MC,
  * field prediction — stays out of scope; [[Mpeg1.decodeAccessUnitRef]]
  * drops the reference chain honestly when it meets one).
  *
  * The reference ships no video codecs (multimodal blobs are opaque bytes
  * there); this extends the engine's LLM-pipeline multimodal family,
  * written against the public 13818-2 spec like the 11172-2 decoder.
  */
object Mpeg2 {
  import Mpeg1.{BitReader, Frame, SeqCtx, Zigzag, clamp255, idct, startCodes}

  /** sequence_extension payload (13818-2 §6.2.2.3): the fields the
    * decoder acts on. `chromaFormat` 1 = 4:2:0 (the only decoded form).
    */
  final case class SeqExt(widthExt: Int, heightExt: Int,
      progressive: Boolean, chromaFormat: Int)

  /** picture_coding_extension payload (§6.2.3.1), intra-relevant fields. */
  private final case class PicExt(intraDcPrecision: Int,
      pictureStructure: Int, framePredFrameDct: Boolean,
      concealmentMv: Boolean, qScaleType: Boolean,
      intraVlcFormat: Boolean, alternateScan: Boolean)

  /** The sequence_extension that IMMEDIATELY follows the sequence header
    * at `off`, or None (= the stream is MPEG-1). The extension start code
    * is 0xB5 with a 4-bit identifier of 0001.
    */
  private[pipeline] def sequenceExtensionAfter(
      bytes: Array[Byte], off: Int): Option[SeqExt] =
    try {
      startCodes(bytes).dropWhile(_._2 <= off).buffered.headOption
        .filter(_._1 == 0xb5).flatMap { case (_, eoff) =>
          val br = new BitReader(bytes, eoff.toLong * 8)
          if (br.bits(4) != 1) None // not a Sequence Extension
          else {
            br.bits(8) // profile_and_level_indication
            val progressive = br.bit() == 1
            val chroma = br.bits(2)
            val wExt = br.bits(2)
            val hExt = br.bits(2)
            br.bits(12) // bit_rate_extension
            require(br.bit() == 1, "Mpeg2SeqExt: missing marker bit")
            require(chroma != 0, "Mpeg2SeqExt: forbidden chroma_format")
            Some(SeqExt(wExt, hExt, progressive, chroma))
          }
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The picture_coding_extension following the picture header at
    * `picOff` (before the first slice), or None.
    */
  private def pictureCodingExtensionAfter(
      bytes: Array[Byte], picOff: Int): Option[PicExt] =
    startCodes(bytes).dropWhile(_._2 <= picOff)
      .takeWhile(c => !(c._1 >= 0x01 && c._1 <= 0xaf)) // stop at slices
      .collect { case (0xb5, eoff) => eoff }
      .map { eoff =>
        // several extensions may sit here (quant matrix, copyright, …):
        // keep scanning until the one with identifier 1000
        val br = new BitReader(bytes, eoff.toLong * 8)
        if (br.bits(4) != 8) None
        else {
          br.bits(16) // f_code[4][4] (unused for intra)
          val dcPrec = br.bits(2) // 0..3 -> 8..11 bits
          val struct = br.bits(2) // 3 = frame picture
          br.bit() // top_field_first
          val fpfd = br.bit() == 1
          val conceal = br.bit() == 1
          val qst = br.bit() == 1
          val ivf = br.bit() == 1
          val alt = br.bit() == 1
          Some(PicExt(8 + dcPrec, struct, fpfd, conceal, qst, ivf, alt))
        }
      }
      .collectFirst { case Some(p) => p }

  /** quantiser_scale from the 5-bit code (Table 7-6): linear = 2·code;
    * non-linear = the spec's stepped table.
    */
  private val NonLinearQ: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112)
  private def quantScale(nonLinear: Boolean, code: Int): Int =
    if (nonLinear) NonLinearQ(code) else 2 * code

  /** alternate scan order (Figure 7-3): scan index -> raster index. */
  private[pipeline] val AltScan: Array[Int] = Array(
    0, 8, 16, 24, 1, 9, 2, 10, 17, 25, 32, 40, 48, 56, 57, 49,
    41, 33, 26, 18, 3, 11, 4, 12, 19, 27, 34, 42, 50, 58, 35, 43,
    51, 59, 20, 28, 5, 13, 6, 14, 21, 29, 36, 44, 52, 60, 37, 45,
    53, 61, 22, 30, 7, 15, 23, 31, 38, 46, 54, 62, 39, 47, 55, 63)

  /** One AC run-level symbol: Table B.14 (intra_vlc_format = 0, shared
    * with MPEG-1) but with the 13818-2 ESCAPE form — 6-bit run + 12-bit
    * SIGNED level (two's complement; 0 and -2048 forbidden), replacing
    * MPEG-1's 8/16-bit staged escape. run == -1 signals EOB.
    */
  private def nextRunLevel2(br: BitReader): (Int, Int) =
    Mpeg1.AcCoeff.decode(br) match {
      case Mpeg1.Eob => (-1, 0)
      case Mpeg1.Esc =>
        val r = br.bits(6)
        val raw = br.bits(12)
        val lvl = if (raw >= 2048) raw - 4096 else raw
        require(lvl != 0 && lvl != -2048, "Mpeg2Escape: forbidden level")
        (r, lvl)
      case (r, m) =>
        val sign = br.bit()
        (r, if (sign == 1) -m else m)
    }

  /** Decode one MPEG-2 intra block (§7.2–7.4): predictive DC at the
    * configured precision, B.14 AC scan under the selected scan order,
    * /32 intra dequantisation with saturation, MISMATCH CONTROL, IDCT.
    * `wRaster` is the intra weight matrix in RASTER order (the scan can
    * be alternate, so weights index through the scan table). Returns the
    * new (unscaled) DC predictor.
    */
  private def decodeBlock2(br: BitReader, luma: Boolean, dcPred: Int,
      qs: Int, dcMult: Int, wRaster: Array[Int], scan: Array[Int],
      plane: Array[Int], stride: Int, px: Int, py: Int): Int = {
    val dcSize =
      (if (luma) Mpeg1.DcSizeLuma else Mpeg1.DcSizeChroma).decode(br)
    val diff =
      if (dcSize == 0) 0
      else {
        val v = br.bits(dcSize)
        if ((v & (1 << (dcSize - 1))) != 0) v else v - (1 << dcSize) + 1
      }
    val dc = dcPred + diff
    val raster = new Array[Int](64)
    raster(0) = math.max(-2048, math.min(2047, dc * dcMult))
    var sum = raster(0)
    var i = 1
    var done = false
    while (!done) {
      val (run, lvl) = nextRunLevel2(br)
      if (run < 0) done = true
      else if (lvl != 0) {
        i += run
        require(i < 64, "Mpeg2Block: coefficient index overflow")
        val ri = scan(i)
        // intra dequant (§7.4.2.3): F'' = (2·QF·W·qs)/32, truncation
        // toward zero, saturate [-2048, 2047] — no oddification
        val recon0 = (2 * lvl * qs * wRaster(ri)) / 32
        val recon = math.max(-2048, math.min(2047, recon0))
        raster(ri) = recon
        sum += recon
        i += 1
      }
    }
    // mismatch control (§7.4.4): the coefficient sum must be odd; when
    // even, toggle the LSB of F[7][7] (-1 if odd, +1 if even — parity
    // flips either way, matching the spec's stated direction)
    if ((sum & 1) == 0)
      raster(63) = if ((raster(63) & 1) != 0) raster(63) - 1 else raster(63) + 1
    val px8 = idct(raster)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        plane((py + r) * stride + px + c) = clamp255(px8(r * 8 + c))
        c += 1
      }
      r += 1
    }
    dc
  }

  /** Decode an MPEG-2 I FRAME-picture whose picture header starts at
    * `picOff`. Returns None for any out-of-scope shape (see the object
    * doc) or when nothing decodes — never wrong pixels.
    */
  def decodeIntraPicture(ctx: SeqCtx, bytes: Array[Byte],
      picOff: Int): Option[Frame] = {
    val ext = ctx.m2.getOrElse(return None)
    if (ext.chromaFormat != 1) return None // 4:2:0 only
    val hbr = new BitReader(bytes, picOff.toLong * 8)
    hbr.bits(10) // temporal_reference
    if (hbr.bits(3) != 1) return None // intra only here
    val pic = pictureCodingExtensionAfter(bytes, picOff).getOrElse(return None)
    if (pic.pictureStructure != 3) return None // frame pictures only
    if (pic.concealmentMv || pic.intraVlcFormat) return None // boundaries
    val scan = if (pic.alternateScan) AltScan else Zigzag
    val dcMult = 8 >> (pic.intraDcPrecision - 8) // 8,4,2,1
    val dcReset = 1 << (pic.intraDcPrecision - 1) // unscaled predictor
    // ctx.intraQ is stored in ZIGZAG order (download order); re-raster it
    // once so alternate-scan weights index correctly
    val wRaster = new Array[Int](64)
    var k = 0
    while (k < 64) { wRaster(Zigzag(k)) = ctx.intraQ(k); k += 1 }
    val mbW = (ctx.width + 15) / 16
    val mbH = (ctx.height + 15) / 16
    val (w16, h16) = (mbW * 16, mbH * 16)
    val y = new Array[Int](w16 * h16)
    val cb = new Array[Int](w16 / 2 * (h16 / 2))
    val cr = new Array[Int](w16 / 2 * (h16 / 2))
    var decodedAny = false
    val scs = startCodes(bytes).dropWhile(_._2 <= picOff)
      .filterNot(c => c._1 == 0xb2 || c._1 == 0xb5).toArray
    var si = 0
    while (si < scs.length && scs(si)._1 >= 1 && scs(si)._1 <= 0xaf) {
      val (code, off) = scs(si)
      try {
        val br = new BitReader(bytes, off.toLong * 8)
        var qs = quantScale(pic.qScaleType, br.bits(5))
        // slice extras (§6.2.4): a leading '1' bit announces
        // intra_slice_flag + intra_slice + reserved (8 bits), then the
        // extra-information loop; a leading '0' ends the header
        if (br.bit() == 1) {
          br.bits(8)
          while (br.bit() == 1) br.bits(8)
        }
        var mbAddr = (code - 1) * mbW - 1
        var yPred, cbPred, crPred = dcReset
        val sliceEndBit =
          (if (si + 1 < scs.length) (scs(si + 1)._2 - 4).toLong
          else bytes.length.toLong) * 8
        var sliceDone = false
        while (!sliceDone && br.pos + 6 <= sliceEndBit) {
          var inc = 0
          var cont = true
          while (cont) {
            Mpeg1.MbAddrInc.decode(br) match {
              case -1 => inc += 33
              // -2 (macroblock_stuffing) was REMOVED in 13818-2: its
              // codeword is invalid here and aborts the slice
              case -2 => throw new IllegalArgumentException(
                "Mpeg2Slice: macroblock_stuffing is MPEG-1 only")
              case v => inc += v; cont = false
            }
          }
          mbAddr += inc
          if (inc != 1) { yPred = dcReset; cbPred = dcReset; crPred = dcReset }
          if (Mpeg1.MbTypeI.decode(br) == 1) // intra + quant
            qs = quantScale(pic.qScaleType, br.bits(5))
          // frame pictures with frame_pred_frame_dct = 0 signal dct_type
          // per macroblock; field DCT (1) is out of scope
          if (!pic.framePredFrameDct && br.bit() == 1)
            throw new IllegalArgumentException(
              "Mpeg2Slice: field DCT not decoded")
          val (mr, mc) = (mbAddr / mbW, mbAddr % mbW)
          require(mr < mbH, "Mpeg2Slice: macroblock row out of range")
          var b = 0
          while (b < 6) {
            b match {
              case 0 | 1 | 2 | 3 =>
                yPred = decodeBlock2(br, luma = true, yPred, qs, dcMult,
                  wRaster, scan, y, w16,
                  mc * 16 + (b % 2) * 8, mr * 16 + (b / 2) * 8)
              case 4 =>
                cbPred = decodeBlock2(br, luma = false, cbPred, qs, dcMult,
                  wRaster, scan, cb, w16 / 2, mc * 8, mr * 8)
              case _ =>
                crPred = decodeBlock2(br, luma = false, crPred, qs, dcMult,
                  wRaster, scan, cr, w16 / 2, mc * 8, mr * 8)
            }
            b += 1
          }
          decodedAny = true
          // zero-padding tail: 11+ zero bits cannot start a macroblock
          if (br.pos + 11 <= sliceEndBit) {
            val save = br.pos
            var allZero = true
            var t = 0
            while (t < 11 && allZero) { if (br.bit() == 1) allZero = false; t += 1 }
            br.pos = save
            if (allZero) sliceDone = true
          } else sliceDone = true
        }
      } catch { case _: Exception => } // damaged slice: keep what decoded
      si += 1
    }
    if (decodedAny) Some(Frame(ctx.width, ctx.height, y, cb, cr)) else None
  }
}
