package graft.pipeline

/** MPEG-2 video decode (ISO/IEC 13818-2 / ITU-T H.262) — the delta over
  * the complete 11172-2 machinery in [[Mpeg1]], for I-, P- AND B- FRAME
  * pictures under frame prediction and frame DCT (the progressive
  * main-profile shape): sequence_extension / picture_coding_extension
  * parsing, configurable intra DC precision (8–11 bits, with the extended
  * B.12/B.13 dct_dc_size codes), PER-COMPONENT f_codes (horizontal and
  * vertical ranges independent, from the picture coding extension — MVs
  * are always half-pel, the full_pel flags are gone), linear AND
  * non-linear quantiser_scale mappings (Table 7-6), the alternate scan
  * (Figure 7-3), the 12-bit signed escape form, /32 dequantisation for
  * both intra and non-intra blocks, and MISMATCH CONTROL (§7.4.4 — the
  * LSB of F[7][7] toggles when the coefficient sum is even) in place of
  * MPEG-1's per-coefficient oddification. Motion compensation, the
  * B-picture direction semantics (per-direction predictors, rounded
  * bidirectional average, skip repeats the previous direction and
  * vectors) and the macroblock-type/CBP tables are shared with [[Mpeg1]]
  * — 13818-2 kept them bit-identical.
  *
  * Frame pictures may set frame_pred_frame_dct = 0: the per-macroblock
  * frame_motion_type is parsed (only the frame-based '10' class decodes)
  * and FIELD DCT (dct_type = 1, §6.3.17.1 Figure 6-14) is fully decoded —
  * the four luma blocks carry the top-field (even) and bottom-field (odd)
  * lines of the macroblock, so coefficient placement interleaves rows
  * with stride 2; 4:2:0 chroma stays frame-organised. The parse order is
  * the spec's macroblock_modes() one: macroblock_type, frame_motion_type,
  * dct_type, THEN quantiser_scale_code.
  *
  * I-pictures carrying concealment motion vectors decode: the vectors
  * are parsed through (their bit length is predictor-independent, and
  * intra pixels never depend on their values) so slices stay in sync.
  *
  * 4:2:2 chroma decodes (half-width full-height chroma planes, the
  * eight-block macroblock with coded_block_pattern_1, horizontal-only
  * chroma vector halving per §7.6.3.7).
  *
  * Declared boundaries (decode returns None for the WHOLE picture, never
  * wrong or partial pixels): field pictures, field-based prediction
  * (frame_motion_type '01'), dual-prime ('11'), intra_vlc_format = 1
  * (Table B.15), concealment motion vectors in P/B pictures (their
  * intra-MB vectors feed later non-intra predictors), field-DCT
  * macroblocks in 4:2:2, and 4:4:4 chroma. [[Mpeg1.decodeAccessUnitRef]]
  * drops the reference chain honestly when it meets one.
  *
  * The reference ships no video codecs (multimodal blobs are opaque bytes
  * there); this extends the engine's LLM-pipeline multimodal family,
  * written against the public 13818-2 spec like the 11172-2 decoder.
  */
object Mpeg2 {
  import Mpeg1.{BitReader, Frame, SeqCtx, Zigzag, clamp255, idct, mcPredict,
    reconMv, startCodes, MbQuantF, MbMfF, MbCbpF, MbIntraF, MbMbF}

  /** sequence_extension payload (13818-2 §6.2.2.3): the fields the
    * decoder acts on. `chromaFormat`: 1 = 4:2:0, 2 = 4:2:2 (both
    * decoded), 3 = 4:4:4 (declared boundary).
    */
  final case class SeqExt(widthExt: Int, heightExt: Int,
      progressive: Boolean, chromaFormat: Int)

  /** picture_coding_extension payload (§6.2.3.1). `fCodes` indexes
    * [s*2 + t]: s = 0 forward / 1 backward, t = 0 horizontal / 1
    * vertical; 15 = unused.
    */
  private final case class PicExt(fCodes: Array[Int], intraDcPrecision: Int,
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
          val f = Array.fill(4)(br.bits(4))
          val dcPrec = br.bits(2) // 0..3 -> 8..11 bits
          val struct = br.bits(2) // 3 = frame picture
          br.bit() // top_field_first
          val fpfd = br.bit() == 1
          val conceal = br.bit() == 1
          val qst = br.bit() == 1
          val ivf = br.bit() == 1
          val alt = br.bit() == 1
          Some(PicExt(f, 8 + dcPrec, struct, fpfd, conceal, qst, ivf, alt))
        }
      }
      .collectFirst { case Some(p) => p }

  /** An in-scope picture met an out-of-scope macroblock shape (field
    * prediction, dual prime). Unlike a damaged slice — where keeping the
    * already-decoded macroblocks is the right recovery — a shape we do
    * not decode means the REST of the picture would be built on pixels we
    * never reconstructed, so the whole picture must return None.
    */
  private final class OutOfScopeShape(msg: String) extends Exception(msg)

  /** quant_matrix_extension (§6.2.3.2, identifier 0011) between the
    * picture header at `picOff` and the first slice: freshly downloaded
    * (intra, non-intra, chroma-intra, chroma-non-intra) matrices in
    * ZIGZAG download order (values 1..255). The chroma pair applies to
    * chroma blocks in 4:2:2/4:4:4 only — 4:2:0 uses the luma pair for
    * every block (§6.3.11).
    */
  private[pipeline] def quantMatrixExtensionAfter(bytes: Array[Byte],
      picOff: Int): (Option[Array[Int]], Option[Array[Int]],
        Option[Array[Int]], Option[Array[Int]]) =
    startCodes(bytes).dropWhile(_._2 <= picOff)
      .takeWhile(c => !(c._1 >= 0x01 && c._1 <= 0xaf)) // stop at slices
      .collect { case (0xb5, eoff) => eoff }
      .map { eoff =>
        val br = new BitReader(bytes, eoff.toLong * 8)
        if (br.bits(4) != 3) None
        else {
          def mat(): Array[Int] = Array.fill(64) {
            val v = br.bits(8)
            require(v != 0, "Mpeg2QuantExt: zero matrix value")
            v
          }
          val intra = if (br.bit() == 1) Some(mat()) else None
          val non = if (br.bit() == 1) Some(mat()) else None
          val cIntra = if (br.bit() == 1) Some(mat()) else None
          val cNon = if (br.bit() == 1) Some(mat()) else None
          Some((intra, non, cIntra, cNon))
        }
      }
      .collectFirst { case Some(p) => p }
      .getOrElse((None, None, None, None))

  /** The carried sequence context with any quant_matrix_extension in
    * this access unit applied. Downloaded matrices PERSIST until the
    * next sequence header or download (§6.3.11) — callers carry the
    * returned context forward, and a later sequence header naturally
    * resets via [[Mpeg1.parseSequenceHeader]] (a fresh SeqCtx has no
    * chroma downloads). §6.3.11 shadowing: a luma download replaces the
    * chroma matrix too (chroma slot resets to "same as luma") unless a
    * chroma download in the SAME extension re-specialises it.
    */
  def withQuantExtensions(ctx: SeqCtx, bytes: Array[Byte],
      picOff: Int): SeqCtx =
    try {
      val (i, n, ci, cn) = quantMatrixExtensionAfter(bytes, picOff)
      if (i.isEmpty && n.isEmpty && ci.isEmpty && cn.isEmpty) ctx
      else ctx.copy(intraQ = i.getOrElse(ctx.intraQ),
        nonIntraQ = n.getOrElse(ctx.nonIntraQ),
        chromaIntraQ =
          ci.orElse(if (i.isDefined) None else ctx.chromaIntraQ),
        chromaNonIntraQ =
          cn.orElse(if (n.isDefined) None else ctx.chromaNonIntraQ))
    } catch { case scala.util.control.NonFatal(_) => ctx }

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

  /** mismatch control (§7.4.4): the coefficient sum must be odd; when
    * even, toggle the LSB of F[7][7] (-1 if odd, +1 if even — parity
    * flips either way, matching the spec's stated direction).
    */
  private def mismatch(raster: Array[Int], sum: Int): Unit =
    if ((sum & 1) == 0)
      raster(63) =
        if ((raster(63) & 1) != 0) raster(63) - 1 else raster(63) + 1

  /** Decode one MPEG-2 intra block (§7.2–7.4): predictive DC at the
    * configured precision, B.14 AC scan under the selected scan order,
    * /32 intra dequantisation with saturation, mismatch control, IDCT.
    * `wRaster` is the intra weight matrix in RASTER order (the scan can
    * be alternate, so weights index through the scan table). Returns the
    * new (unscaled) DC predictor.
    */
  private def decodeBlock2(br: BitReader, luma: Boolean, dcPred: Int,
      qs: Int, dcMult: Int, wRaster: Array[Int], scan: Array[Int],
      plane: Array[Int], stride: Int, px: Int, py: Int,
      rowStep: Int = 1): Int = {
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
    mismatch(raster, sum)
    val px8 = idct(raster)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        plane((py + r * rowStep) * stride + px + c) = clamp255(px8(r * 8 + c))
        c += 1
      }
      r += 1
    }
    dc
  }

  /** Decode one NON-intra residual block: dct_coeff_first (the "1s"
    * codeword means (0, ±1) and EOB cannot occur — unchanged from
    * MPEG-1), then B.14 with the 13818-2 escape until EOB; non-intra
    * dequantisation F'' = ((2·QF + Sign(QF))·W·qs)/32 with saturation
    * and mismatch control (§7.4.2.3/§7.4.4); IDCT; residual ADDED onto
    * the motion prediction already in `plane`.
    */
  private def decodeNonIntraBlock2(br: BitReader, qs: Int,
      wRaster: Array[Int], scan: Array[Int], plane: Array[Int],
      stride: Int, px: Int, py: Int, rowStep: Int = 1): Unit = {
    val raster = new Array[Int](64)
    var sum = 0
    var i = 0 // next free scan position; first coeff lands at its run
    var first = true
    var done = false
    while (!done) {
      val (run, lvl) =
        if (first) {
          val save = br.pos
          if (br.bit() == 1) { // dct_coeff_first "1s" = (0, ±1)
            if (br.bit() == 1) (0, -1) else (0, 1)
          } else { br.pos = save; nextRunLevel2(br) }
        } else nextRunLevel2(br)
      first = false
      if (run < 0) done = true
      else if (lvl != 0) {
        i += run
        require(i < 64, "Mpeg2Block: coefficient index overflow")
        val ri = scan(i)
        val recon0 = ((2 * lvl + Integer.signum(lvl)) * qs * wRaster(ri)) / 32
        val recon = math.max(-2048, math.min(2047, recon0))
        raster(ri) = recon
        sum += recon
        i += 1
      }
    }
    mismatch(raster, sum)
    val res = idct(raster)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val at = (py + r * rowStep) * stride + px + c
        plane(at) = clamp255(plane(at) + res(r * 8 + c))
        c += 1
      }
      r += 1
    }
  }

  /** Back-compat intra entry (I frame-pictures). */
  def decodeIntraPicture(ctx: SeqCtx, bytes: Array[Byte],
      picOff: Int): Option[Frame] = decodePicture(ctx, bytes, picOff)

  /** Decode an MPEG-2 I/P/B FRAME-picture whose picture header starts at
    * `picOff`. P needs `ref` (its forward reference); B needs `ref`
    * (backward/future) AND `past` (forward) — the [[Mpeg1]] carry
    * convention. Returns None for any out-of-scope shape (see the object
    * doc) or when nothing decodes — never wrong pixels.
    */
  def decodePicture(ctx: SeqCtx, bytes: Array[Byte], picOff: Int,
      ref: Option[Frame] = None, past: Option[Frame] = None): Option[Frame] = {
    val ext = ctx.m2.getOrElse(return None)
    // 4:2:0 and 4:2:2 decode; 4:4:4 is a declared boundary. In 4:2:2 the
    // chroma planes are half WIDTH only (full height): each macroblock
    // carries EIGHT blocks — 4 luma, then Cb/Cr of the top 8 chroma
    // lines (blocks 4/5) and Cb/Cr of the bottom 8 (blocks 6/7) — and
    // chroma motion vectors halve only their horizontal component
    // (§7.6.3.7).
    val c422 = ext.chromaFormat == 2
    if (ext.chromaFormat != 1 && !c422) return None
    val hbr = new BitReader(bytes, picOff.toLong * 8)
    hbr.bits(10) // temporal_reference
    val picType = hbr.bits(3)
    val isP = picType == 2
    val isB = picType == 3
    if (picType < 1 || picType > 3) return None // no D in 13818-2
    if (isP && ref.isEmpty) return None
    if (isB && (ref.isEmpty || past.isEmpty)) return None
    val pic = pictureCodingExtensionAfter(bytes, picOff).getOrElse(return None)
    if (pic.pictureStructure != 3) return None // frame pictures only
    if (pic.intraVlcFormat) return None // Table B.15: declared boundary
    // concealment motion vectors (§7.6.3.9): in I-pictures they exist for
    // error resilience only — intra pixels never depend on their values,
    // and their bit length never depends on predictor state, so parsing
    // them through keeps slice sync with zero semantic risk. P/B pictures
    // with concealment stay a declared boundary (their intra-MB conceal
    // vectors feed later non-intra predictors).
    if (pic.concealmentMv && picType != 1) return None
    val fwdOk = pic.fCodes(0) >= 1 && pic.fCodes(0) <= 9 &&
      pic.fCodes(1) >= 1 && pic.fCodes(1) <= 9
    val bwdOk = pic.fCodes(2) >= 1 && pic.fCodes(2) <= 9 &&
      pic.fCodes(3) >= 1 && pic.fCodes(3) <= 9
    if ((isP || isB) && !fwdOk) return None
    if (isB && !bwdOk) return None
    val scan = if (pic.alternateScan) AltScan else Zigzag
    val dcMult = 8 >> (pic.intraDcPrecision - 8) // 8,4,2,1
    val dcReset = 1 << (pic.intraDcPrecision - 1) // unscaled predictor
    // ctx matrices are stored in ZIGZAG order (download order); re-raster
    // them once so alternate-scan weights index correctly. In 4:2:2 the
    // chroma blocks use the chroma pair when one was downloaded
    // (§6.3.11); in 4:2:0 only two matrices exist and chroma downloads
    // are ignored, so the chroma pair aliases the luma pair there.
    val wIntra = new Array[Int](64)
    val wNon = new Array[Int](64)
    var k = 0
    while (k < 64) {
      wIntra(Zigzag(k)) = ctx.intraQ(k)
      wNon(Zigzag(k)) = ctx.nonIntraQ(k)
      k += 1
    }
    val wIntraC = ctx.chromaIntraQ.filter(_ => c422) match {
      case Some(q) =>
        val a = new Array[Int](64)
        var j = 0
        while (j < 64) { a(Zigzag(j)) = q(j); j += 1 }
        a
      case None => wIntra
    }
    val wNonC = ctx.chromaNonIntraQ.filter(_ => c422) match {
      case Some(q) =>
        val a = new Array[Int](64)
        var j = 0
        while (j < 64) { a(Zigzag(j)) = q(j); j += 1 }
        a
      case None => wNon
    }
    val mbW = (ctx.width + 15) / 16
    val mbH = (ctx.height + 15) / 16
    val (w16, h16) = (mbW * 16, mbH * 16)
    // P planes start as the reference copy (= skip semantics); B planes
    // start as the FORWARD reference copy, same rationale as Mpeg1
    val base = if (isB) past else ref
    val chH = if (c422) h16 else h16 / 2 // chroma plane height
    val y = if (isP || isB) base.get.y.clone() else new Array[Int](w16 * h16)
    val cb = if (isP || isB) base.get.cb.clone()
      else new Array[Int](w16 / 2 * chH)
    val cr = if (isP || isB) base.get.cr.clone()
      else new Array[Int](w16 / 2 * chH)
    val (refY, refCb, refCr) = (if (isB) past else ref) match {
      case Some(f) => (f.y, f.cb, f.cr)
      case None => (y, cb, cr) // unused on the I path
    }
    val (bakY, bakCb, bakCr) = (if (isB) ref else None) match {
      case Some(f) => (f.y, f.cb, f.cr)
      case None => (y, cb, cr) // unused outside B
    }
    var decodedAny = false
    val scs = startCodes(bytes).dropWhile(_._2 <= picOff)
      .filterNot(c => c._1 == 0xb2 || c._1 == 0xb5).toArray
    var si = 0
    try while (si < scs.length && scs(si)._1 >= 1 && scs(si)._1 <= 0xaf) {
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
        var pmx, pmy = 0 // forward MV predictors, half-pel units
        var pmxb, pmyb = 0 // backward MV predictors (B-pictures)
        var prevDir = MbMfF | MbMbF // what a skipped B macroblock repeats
        // chroma MC: 4:2:0 halves both vector components over 8×8
        // blocks; 4:2:2 halves only the horizontal one over 8×16
        // (§7.6.3.7 — chroma keeps full vertical resolution)
        def mcChroma(src: Array[Int], dst: Array[Int], mr: Int, mc: Int,
            mvx: Int, mvy: Int, blend: Boolean): Unit =
          if (c422)
            mcPredict(src, dst, w16 / 2, h16, mc * 8, mr * 16, 8, 16,
              mvx / 2, mvy, blend)
          else
            mcPredict(src, dst, w16 / 2, h16 / 2, mc * 8, mr * 8, 8, 8,
              mvx / 2, mvy / 2, blend)
        def predictB(dir: Int, mr: Int, mc: Int): Unit = {
          val f = (dir & MbMfF) != 0
          val bk = (dir & MbMbF) != 0
          if (f) {
            mcPredict(refY, y, w16, h16, mc * 16, mr * 16, 16, 16, pmx, pmy)
            mcChroma(refCb, cb, mr, mc, pmx, pmy, blend = false)
            mcChroma(refCr, cr, mr, mc, pmx, pmy, blend = false)
          }
          if (bk) {
            mcPredict(bakY, y, w16, h16, mc * 16, mr * 16, 16, 16,
              pmxb, pmyb, blend = f)
            mcChroma(bakCb, cb, mr, mc, pmxb, pmyb, blend = f)
            mcChroma(bakCr, cr, mr, mc, pmxb, pmyb, blend = f)
          }
        }
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
          if (inc != 1) {
            // skipped macroblocks: DC predictors reset; in P the MV
            // predictors reset too and the skip is a zero-motion copy
            // (already provided by the plane init); in B the predictors
            // PERSIST and each skipped macroblock repeats the previous
            // macroblock's direction with them (§7.6.6)
            yPred = dcReset; cbPred = dcReset; crPred = dcReset
            if (isB) {
              var a = mbAddr - inc + 1
              while (a < mbAddr && a >= 0) {
                predictB(prevDir, a / mbW, a % mbW)
                a += 1
              }
            } else { pmx = 0; pmy = 0 }
          }
          val flags =
            if (isB) Mpeg1.MbTypeB.decode(br)
            else if (isP) Mpeg1.MbTypeP.decode(br)
            else if (Mpeg1.MbTypeI.decode(br) == 1) MbQuantF | MbIntraF
            else MbIntraF
          // macroblock_modes() order (§6.2.5.1): after macroblock_type
          // come frame_motion_type (motion-bearing MBs, fpfd = 0) and
          // dct_type (intra/pattern MBs, fpfd = 0), and only THEN the
          // quantiser_scale_code of the macroblock() layer.
          if (!pic.framePredFrameDct &&
              (flags & (MbMfF | MbMbF)) != 0 && br.bits(2) != 2)
            // '10' = frame-based; '01' field-based and '11' dual-prime
            // are undecodable shapes — the WHOLE picture must drop
            throw new OutOfScopeShape(
              "Mpeg2Slice: field / dual-prime prediction not decoded")
          val fieldDct = !pic.framePredFrameDct &&
            (flags & (MbIntraF | MbCbpF)) != 0 && br.bit() == 1
          // field DCT (Figure 6-14): luma blocks 0/1 carry the TOP field
          // (even macroblock lines), 2/3 the BOTTOM field (odd lines),
          // each spanning all 16 lines at row stride 2; chroma in 4:2:0
          // is always frame-organised. Field-DCT macroblocks in 4:2:2
          // (where chroma has the vertical resolution to be field
          // organised too) stay a declared boundary.
          if (fieldDct && c422)
            throw new OutOfScopeShape(
              "Mpeg2Slice: 4:2:2 field DCT not decoded")
          val lumaStep = if (fieldDct) 2 else 1
          def lumaY(mr: Int, b: Int): Int =
            if (fieldDct) mr * 16 + (b / 2) else mr * 16 + (b / 2) * 8
          // chroma block geometry: 4:2:0 has one 8×8 Cb + Cr pair per
          // macroblock; 4:2:2 has two pairs — blocks 4/5 the top 8
          // chroma lines, 6/7 the bottom 8. Block b ≥ 4: even = Cb,
          // odd = Cr.
          val nBlocks = if (c422) 8 else 6
          def chromaY(mr: Int, b: Int): Int =
            if (c422) mr * 16 + (if (b >= 6) 8 else 0) else mr * 8
          if ((flags & MbQuantF) != 0)
            qs = quantScale(pic.qScaleType, br.bits(5))
          // macroblock() reads motion_vectors(0) for forward-predicted
          // MBs AND for intra MBs under concealment_motion_vectors
          val concealRead = (flags & MbIntraF) != 0 && pic.concealmentMv
          if ((flags & MbMfF) != 0 || concealRead) {
            // frame motion vectors, PER-COMPONENT f_codes, half-pel units
            val cx = Mpeg1.MvCode.decode(br)
            val rx =
              if (pic.fCodes(0) > 1 && cx != 0) br.bits(pic.fCodes(0) - 1)
              else 0
            pmx = reconMv(pmx, cx, rx, pic.fCodes(0))
            val cy = Mpeg1.MvCode.decode(br)
            val ry =
              if (pic.fCodes(1) > 1 && cy != 0) br.bits(pic.fCodes(1) - 1)
              else 0
            pmy = reconMv(pmy, cy, ry, pic.fCodes(1))
          } else if (!isB) {
            pmx = 0; pmy = 0 // P intra / coded-without-MC: zero MV
          } // B: an unread direction leaves its predictor UNCHANGED
          if ((flags & MbMbF) != 0) {
            val cx = Mpeg1.MvCode.decode(br)
            val rx =
              if (pic.fCodes(2) > 1 && cx != 0) br.bits(pic.fCodes(2) - 1)
              else 0
            pmxb = reconMv(pmxb, cx, rx, pic.fCodes(2))
            val cy = Mpeg1.MvCode.decode(br)
            val ry =
              if (pic.fCodes(3) > 1 && cy != 0) br.bits(pic.fCodes(3) - 1)
              else 0
            pmyb = reconMv(pmyb, cy, ry, pic.fCodes(3))
          }
          if (concealRead)
            require(br.bit() == 1, "Mpeg2Slice: missing concealment marker")
          if (isB && (flags & MbIntraF) != 0) {
            // intra macroblock in a B-picture: ALL MV predictors reset
            pmx = 0; pmy = 0; pmxb = 0; pmyb = 0
          }
          val (mr, mc) = (mbAddr / mbW, mbAddr % mbW)
          require(mr < mbH, "Mpeg2Slice: macroblock row out of range")
          if ((flags & MbIntraF) != 0) {
            var b = 0
            while (b < nBlocks) {
              if (b < 4)
                yPred = decodeBlock2(br, luma = true, yPred, qs, dcMult,
                  wIntra, scan, y, w16,
                  mc * 16 + (b % 2) * 8, lumaY(mr, b), lumaStep)
              else if (b % 2 == 0)
                cbPred = decodeBlock2(br, luma = false, cbPred, qs, dcMult,
                  wIntraC, scan, cb, w16 / 2, mc * 8, chromaY(mr, b))
              else
                crPred = decodeBlock2(br, luma = false, crPred, qs, dcMult,
                  wIntraC, scan, cr, w16 / 2, mc * 8, chromaY(mr, b))
              b += 1
            }
          } else {
            // non-intra macroblock: motion prediction then residuals;
            // chroma vectors per §7.6.3.7 (see mcChroma)
            yPred = dcReset; cbPred = dcReset; crPred = dcReset
            if (isB) predictB(flags & (MbMfF | MbMbF), mr, mc)
            else {
              mcPredict(refY, y, w16, h16, mc * 16, mr * 16, 16, 16, pmx, pmy)
              mcChroma(refCb, cb, mr, mc, pmx, pmy, blend = false)
              mcChroma(refCr, cr, mr, mc, pmx, pmy, blend = false)
            }
            // coded_block_pattern(): the 6-bit B.9 VLC covers blocks
            // 0–5; 4:2:2 appends coded_block_pattern_1 (2 bits) for
            // blocks 6–7 (§6.2.5.3)
            val cbp = if ((flags & MbCbpF) != 0) Mpeg1.Cbp.decode(br) else 0
            val cbp1 =
              if (c422 && (flags & MbCbpF) != 0) br.bits(2) else 0
            def coded(b: Int): Boolean =
              if (b < 6) (cbp & (1 << (5 - b))) != 0
              else (cbp1 & (1 << (7 - b))) != 0
            var b = 0
            while (b < nBlocks) {
              if (coded(b)) {
                if (b < 4)
                  decodeNonIntraBlock2(br, qs, wNon, scan, y, w16,
                    mc * 16 + (b % 2) * 8, lumaY(mr, b), lumaStep)
                else if (b % 2 == 0)
                  decodeNonIntraBlock2(br, qs, wNonC, scan, cb,
                    w16 / 2, mc * 8, chromaY(mr, b))
                else
                  decodeNonIntraBlock2(br, qs, wNonC, scan, cr,
                    w16 / 2, mc * 8, chromaY(mr, b))
              }
              b += 1
            }
          }
          prevDir =
            if ((flags & MbIntraF) != 0) MbMfF | MbMbF
            else flags & (MbMfF | MbMbF)
          decodedAny = true
          // padding tail: if every bit to the slice end is 0, done
          if (br.remaining <= 0 || br.pos >= sliceEndBit) sliceDone = true
          else {
            val save = br.pos
            var allZero = true
            while (allZero && br.pos < sliceEndBit) {
              if (br.bit() == 1) allZero = false
            }
            br.pos = save
            if (allZero) sliceDone = true
          }
        }
      } catch {
        case oos: OutOfScopeShape => throw oos // whole picture drops
        case _: Exception => // damaged slice: keep what decoded
      }
      si += 1
    } catch { case _: OutOfScopeShape => return None }
    if (decodedAny) Some(Frame(ctx.width, ctx.height, y, cb, cr)) else None
  }
}
