package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** ISO/IEC 11172-1 PROGRAM STREAM — the container real `.mpg` files use:
  * a chain of packs (system clock + mux rate), each carrying PES packets
  * whose payloads interleave the elementary streams. The demux here walks
  * pack/system/PES headers, reassembles the VIDEO elementary stream
  * (stream ids 0xE0–0xEF), and splits it into picture access units that
  * feed the complete 11172-2 decoder in [[Mpeg1]] — closing the gap that
  * the decoder previously met MPEG-1 video only inside MP4 tracks.
  *
  * The reference ships no video codecs at all (multimodal blobs are
  * opaque bytes there); this is engine-added capability, written against
  * the public 11172-1 spec (§2.4.3: pack_header, system_header,
  * packet). MPEG-2 program streams (13818-1) differ only in the pack
  * marker bits and the flags-form PES header — both tolerated so a
  * 13818-1 mux of an MPEG-1 video stream still demuxes.
  */
object Mpeg1Ps {

  /** A program stream starts with the pack start code 00 00 01 BA. */
  def isProgramStream(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == 1 && (bytes(3) & 0xff) == 0xba

  /** Demuxed video: the reassembled elementary stream plus one
    * (offset, length, tsMs) triple per ACCESS UNIT — a picture with any
    * sequence/GOP headers that immediately precede it, so
    * [[Mpeg1.decodeAccessUnitRef]] sees the same unit shape the MP4
    * track walker feeds it. tsMs comes from the PTS (90 kHz) of the PES
    * packet carrying the unit's first byte; -1 when that PES had none.
    */
  final case class PsVideo(es: Array[Byte], units: Array[(Int, Int, Long)])

  /** 33-bit PTS/DTS field starting at `p` (the '001x' marker nibble
    * byte): 3+15+15 bits interleaved with marker bits (11172-1 §2.4.3.4).
    */
  private def ts33(b: Array[Byte], p: Int): Long =
    (((b(p) >> 1) & 0x7).toLong << 30) |
      ((b(p + 1) & 0xff).toLong << 22) |
      (((b(p + 2) & 0xff) >> 1).toLong << 15) |
      ((b(p + 3) & 0xff).toLong << 7) |
      ((b(p + 4) & 0xff) >> 1).toLong

  /** Walk the pack/PES structure and reassemble the video ES. Returns
    * None when the blob is not a program stream or no video PES parses.
    * Multi-stream files: the FIRST video stream id seen wins; audio
    * (0xC0–0xDF), private (0xBD), padding (0xBE) and other ids skip via
    * their declared packet length.
    */
  def demuxVideo(bytes: Array[Byte]): Option[PsVideo] = {
    if (!isProgramStream(bytes)) return None
    try {
      val es = new java.io.ByteArrayOutputStream()
      // (es offset, pts ticks) marks, in es order
      val marks = ArrayBuffer.empty[(Int, Long)]
      var videoId = -1
      var pos = 0
      val n = bytes.length
      def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      var end = false
      while (!end && pos + 4 <= n) {
        if (!(bytes(pos) == 0 && bytes(pos + 1) == 0 && bytes(pos + 2) == 1)) {
          // resync: tolerate stuffing/garbage between packs (real muxers
          // zero-pad); scan to the next start-code prefix
          pos += 1
        } else (bytes(pos + 3) & 0xff) match {
          case 0xba => // pack header
            if (pos + 5 > n) end = true
            else if ((bytes(pos + 4) & 0xf0) == 0x20) pos += 12 // 11172-1
            else if ((bytes(pos + 4) & 0xc0) == 0x40) { // 13818-1
              if (pos + 14 > n) end = true
              else pos += 14 + (bytes(pos + 13) & 0x7)
            } else end = true // neither marker: not a PS pack
          case 0xb9 => end = true // MPEG_program_end_code
          case 0xbb => // system header: skip by length
            if (pos + 6 > n) end = true else pos += 6 + u16(pos + 4)
          case sid if sid >= 0xbc => // PES packet
            if (pos + 6 > n) { end = true }
            else {
              val plen = u16(pos + 4)
              val pstart = pos + 6
              val pend = math.min(n, pstart + plen)
              if (sid >= 0xe0 && sid <= 0xef &&
                  (videoId == -1 || sid == videoId)) {
                videoId = sid
                // PES header inside the payload (11172-1 §2.4.3.3):
                // stuffing FFs, optional STD buffer size, then the
                // PTS/DTS nibble — or the 13818-1 flags form ('10'
                // marker + flags + header_data_length)
                var p = pstart
                while (p < pend && (bytes(p) & 0xff) == 0xff) p += 1
                if (p + 1 < pend && (bytes(p) & 0xc0) == 0x40) p += 2
                var pts = -1L
                if (p < pend) (bytes(p) & 0xf0) match {
                  case 0x20 if p + 5 <= pend => // PTS only
                    pts = ts33(bytes, p); p += 5
                  case 0x30 if p + 10 <= pend => // PTS + DTS
                    pts = ts33(bytes, p); p += 10
                  case _ if (bytes(p) & 0xc0) == 0x80 && p + 3 <= pend =>
                    // 13818-1 flags form
                    if ((bytes(p + 1) & 0x80) != 0 && p + 8 <= pend)
                      pts = ts33(bytes, p + 3)
                    p += 3 + (bytes(p + 2) & 0xff)
                  case _ => p += 1 // '0000 1111' no-timestamp byte
                }
                if (p < pend) {
                  if (pts >= 0) marks += ((es.size(), pts))
                  es.write(bytes, p, pend - p)
                }
              }
              pos = pstart + plen
            }
          case _ => pos += 1 // stray byte pattern: resync
        }
      }
      splitVideo(es.toByteArray, marks)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Split a reassembled video elementary stream into access units: a
    * unit starts at each PICTURE start code (00 00 01 00), widened
    * backwards over any immediately preceding sequence (B3) / GOP (B8) /
    * extension (B5) / user-data (B2) headers — the shape
    * [[Mpeg1.decodeAccessUnitRef]] expects. `marks` are (es offset,
    * 90 kHz PTS) pairs in es order; each unit takes the latest mark at
    * or before its start. Shared by the program-stream and
    * transport-stream demuxers.
    */
  private[pipeline] def splitVideo(e: Array[Byte],
      marks: collection.Seq[(Int, Long)]): Option[PsVideo] = {
    if (e.isEmpty) return None
    val auStarts = ArrayBuffer.empty[Int]
    var pending = -1
    var i = 0
    while (i + 3 < e.length) {
      if (e(i) == 0 && e(i + 1) == 0 && e(i + 2) == 1) {
        val code = e(i + 3) & 0xff
        if (code == 0xb3 || code == 0xb8 || code == 0xb5 || code == 0xb2) {
          if (pending < 0) pending = i
        } else if (code == 0x00) {
          auStarts += (if (pending >= 0) pending else i)
          pending = -1
        } else pending = -1 // slice or other code: headers consumed
        i += 4
      } else i += 1
    }
    if (auStarts.isEmpty) return None
    val units = Array.tabulate(auStarts.length) { k =>
      val s = auStarts(k)
      val until = if (k + 1 < auStarts.length) auStarts(k + 1) else e.length
      // tsMs from the latest PES mark at or before the unit start
      val pts = marks.reverseIterator.collectFirst {
        case (off, t) if off <= s => t
      }.getOrElse(-90L)
      (s, until - s, pts / 90)
    }
    Some(PsVideo(e, units))
  }

  /** Write-side twin (the fixture/roundtrip path): wrap encoded access
    * units into an 11172-1 program stream — one pack per unit, one video
    * PES per ≤60000-byte chunk (the 16-bit PES length bound), PTS on the
    * first chunk of each unit, MPEG_program_end_code at the tail.
    */
  def mux(accessUnits: Seq[Array[Byte]], fps: Int = 25,
      streamId: Int = 0xe0): Array[Byte] = {
    require(accessUnits.nonEmpty, "at least one access unit")
    require(streamId >= 0xe0 && streamId <= 0xef, s"video id: $streamId")
    val out = new java.io.ByteArrayOutputStream()
    def put33(nibble: Int, v: Long): Unit = {
      out.write((nibble << 4) | (((v >> 30) & 0x7).toInt << 1) | 1)
      out.write(((v >> 22) & 0xff).toInt)
      out.write((((v >> 15) & 0x7f).toInt << 1) | 1)
      out.write(((v >> 7) & 0xff).toInt)
      out.write((((v & 0x7f).toInt) << 1) | 1)
    }
    accessUnits.zipWithIndex.foreach { case (au, k) =>
      val pts = 90000L * (k + 1) / fps + 90000L
      // pack header: start code + SCR ('0010' form) + mux_rate (3 bytes,
      // marker bits set; the rate value itself is informational here)
      out.write(Array[Byte](0, 0, 1, 0xba.toByte))
      put33(0x2, pts)
      out.write(0x80 | ((6144 >> 15) & 0x7f)); out.write((6144 >> 7) & 0xff)
      out.write((((6144 & 0x7f) << 1) | 1) & 0xff)
      var off = 0
      var first = true
      while (off < au.length) {
        val chunk = math.min(60000, au.length - off)
        val hdrLen = if (first) 5 else 1
        out.write(Array[Byte](0, 0, 1, streamId.toByte))
        out.write(((chunk + hdrLen) >> 8) & 0xff)
        out.write((chunk + hdrLen) & 0xff)
        if (first) put33(0x2, pts) else out.write(0x0f)
        out.write(au, off, chunk)
        off += chunk
        first = false
      }
    }
    out.write(Array[Byte](0, 0, 1, 0xb9.toByte))
    out.toByteArray
  }
}
