package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** ISO/IEC 13818-1 TRANSPORT STREAM — the container broadcast captures
  * and `.ts` files use: fixed 188-byte packets (sync byte 0x47), each
  * carrying a 13-bit PID, an optional adaptation field and a payload
  * slice of one elementary stream's PES packets. The demux here finds
  * the video PID through the real PSI route — PAT (PID 0) → PMT →
  * first MPEG-1/2 video entry (stream_type 0x01/0x02) — with a
  * PES-sniffing fallback for PAT-less captures, reassembles the video
  * PES payloads across packets (PUSI boundaries, unbounded
  * PES_packet_length 0 as video streams use), and splits the elementary
  * stream into picture access units via [[Mpeg1Ps.splitVideo]], feeding
  * the same MPEG-1/2 decoders the program-stream and MP4 paths feed.
  *
  * The reference ships no video codecs at all (multimodal blobs are
  * opaque bytes there); this is engine-added capability, written
  * against the public 13818-1 spec (§2.4.3 transport packet layer,
  * §2.4.4 PSI).
  */
object Mpeg2Ts {

  private val Pkt = 188

  /** A transport stream: 0x47 sync bytes at every 188-byte boundary and
    * a legal adaptation_field_control (00 is reserved and never occurs
    * in real packets — this is what rejects a run of 'G' text, whose
    * every byte is 0x47 and whose implied AFC is 00), checked across up
    * to the first four packets.
    */
  def isTransportStream(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 2 * Pkt) return false
    val n = math.min(4, bytes.length / Pkt)
    (0 until n).forall { k =>
      (bytes(k * Pkt) & 0xff) == 0x47 &&
        ((bytes(k * Pkt + 3) >> 4) & 0x3) != 0
    }
  }

  /** (payload offset, payload end) of packet `p`, or None when the
    * packet has no payload / is malformed.
    */
  private def payloadBounds(b: Array[Byte], p: Int): Option[(Int, Int)] = {
    val afc = (b(p + 3) >> 4) & 0x3
    if ((afc & 1) == 0) return None // no payload
    var off = p + 4
    if ((afc & 2) != 0) { // adaptation field precedes the payload
      val len = b(p + 4) & 0xff
      off = p + 5 + len
    }
    if (off >= p + Pkt) None else Some((off, p + Pkt))
  }

  private def pidOf(b: Array[Byte], p: Int): Int =
    ((b(p + 1) & 0x1f) << 8) | (b(p + 2) & 0xff)
  private def pusi(b: Array[Byte], p: Int): Boolean = (b(p + 1) & 0x40) != 0

  /** The video PID advertised by PAT → PMT (stream_type 0x01/0x02), or
    * -1. Sections are assumed to fit one packet — true for the PAT/PMT
    * sizes real muxers (and ours) emit.
    */
  private def psiVideoPid(b: Array[Byte]): Int = {
    var pmtPid = -1
    var p = 0
    while (p + Pkt <= b.length && pmtPid < 0) {
      if ((b(p) & 0xff) == 0x47 && pidOf(b, p) == 0 && pusi(b, p))
        payloadBounds(b, p).foreach { case (off0, end) =>
          val off = off0 + 1 + (b(off0) & 0xff) // pointer_field
          if (off + 8 < end && (b(off) & 0xff) == 0x00) { // PAT table_id
            val secLen = ((b(off + 1) & 0xf) << 8) | (b(off + 2) & 0xff)
            // programs sit after the 5 fixed post-length bytes; 4-byte
            // entries; CRC32 takes the last 4
            var q = off + 8
            val stop = math.min(end, off + 3 + secLen - 4)
            while (q + 4 <= stop && pmtPid < 0) {
              val progNum = ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff)
              val pid = ((b(q + 2) & 0x1f) << 8) | (b(q + 3) & 0xff)
              if (progNum != 0) pmtPid = pid // 0 = network PID: skip
              q += 4
            }
          }
        }
      p += Pkt
    }
    if (pmtPid < 0) return -1
    var video = -1
    p = 0
    while (p + Pkt <= b.length && video < 0) {
      if ((b(p) & 0xff) == 0x47 && pidOf(b, p) == pmtPid && pusi(b, p))
        payloadBounds(b, p).foreach { case (off0, end) =>
          val off = off0 + 1 + (b(off0) & 0xff)
          if (off + 12 < end && (b(off) & 0xff) == 0x02) { // PMT table_id
            val secLen = ((b(off + 1) & 0xf) << 8) | (b(off + 2) & 0xff)
            val progInfoLen = ((b(off + 10) & 0xf) << 8) | (b(off + 11) & 0xff)
            var q = off + 12 + progInfoLen
            val stop = math.min(end, off + 3 + secLen - 4)
            while (q + 5 <= stop && video < 0) {
              val st = b(q) & 0xff
              val pid = ((b(q + 1) & 0x1f) << 8) | (b(q + 2) & 0xff)
              val esLen = ((b(q + 3) & 0xf) << 8) | (b(q + 4) & 0xff)
              if (st == 0x01 || st == 0x02) video = pid
              q += 5 + esLen
            }
          }
        }
      p += Pkt
    }
    video
  }

  /** Walk the packet grid and reassemble the video elementary stream.
    * Returns None when the blob is not a transport stream or no video
    * parses. PID choice: PSI route first; else the first PID whose
    * PUSI payload starts a video PES (stream id 0xE0–0xEF).
    */
  def demuxVideo(bytes: Array[Byte]): Option[Mpeg1Ps.PsVideo] = {
    if (!isTransportStream(bytes)) return None
    try {
      var videoPid = psiVideoPid(bytes)
      if (videoPid < 0) { // PAT-less capture: sniff a video PES start
        var p = 0
        while (p + Pkt <= bytes.length && videoPid < 0) {
          if ((bytes(p) & 0xff) == 0x47 && pusi(bytes, p))
            payloadBounds(bytes, p).foreach { case (off, end) =>
              if (off + 3 < end && bytes(off) == 0 && bytes(off + 1) == 0 &&
                bytes(off + 2) == 1 && (bytes(off + 3) & 0xf0) == 0xe0)
                videoPid = pidOf(bytes, p)
            }
          p += Pkt
        }
      }
      if (videoPid < 0) return None
      val es = new java.io.ByteArrayOutputStream()
      val marks = ArrayBuffer.empty[(Int, Long)]
      var inPes = false
      var lastCc = -1 // last continuity_counter seen on the video PID
      var hdrSkip = 0 // PES header bytes spilling into the NEXT packet
      var p = 0
      while (p + Pkt <= bytes.length) {
        if ((bytes(p) & 0xff) == 0x47 && pidOf(bytes, p) == videoPid) {
          // §2.4.3.3 duplicate discard: a payload-bearing packet may be
          // sent twice with the SAME continuity_counter (the counter
          // increments only per payload); the second copy must be
          // dropped, else its payload enters the elementary stream twice
          val cc = bytes(p + 3) & 0xf
          val hasPayload = ((bytes(p + 3) >> 4) & 1) != 0
          if (hasPayload && cc == lastCc) { /* duplicate: drop */ }
          else {
            if (hasPayload) lastCc = cc
            payloadBounds(bytes, p).foreach { case (off0, end) =>
              var off = off0
              if (pusi(bytes, p)) {
                hdrSkip = 0
                // new PES packet: 00 00 01 Exx, 16-bit length (0 =
                // unbounded for video), then the 13818-1 flags-form
                // header — '10' marker, flags, header_data_length
                if (off + 9 <= end && bytes(off) == 0 && bytes(off + 1) == 0 &&
                  bytes(off + 2) == 1 && (bytes(off + 3) & 0xf0) == 0xe0 &&
                  (bytes(off + 6) & 0xc0) == 0x80) {
                  val hdrLen = bytes(off + 8) & 0xff
                  if ((bytes(off + 7) & 0x80) != 0 && off + 14 <= end) {
                    // PTS present: '001x' nibble field at off+9
                    val pts =
                      (((bytes(off + 9) >> 1) & 0x7).toLong << 30) |
                        ((bytes(off + 10) & 0xff).toLong << 22) |
                        (((bytes(off + 11) & 0xff) >> 1).toLong << 15) |
                        ((bytes(off + 12) & 0xff).toLong << 7) |
                        ((bytes(off + 13) & 0xff) >> 1).toLong
                    marks += ((es.size(), pts))
                  }
                  off = off + 9 + hdrLen
                  if (off > end) { // header spills past this packet:
                    hdrSkip = off - end // consume it from the next ones
                    off = end
                  }
                  inPes = true
                } else inPes = false // scrambled/odd payload: skip this PES
              } else if (hdrSkip > 0) {
                // tail of a spilled PES header: header bytes, not ES data
                val k = math.min(hdrSkip, end - off)
                off += k
                hdrSkip -= k
              }
              if (inPes && off < end) es.write(bytes, off, end - off)
            }
          }
        }
        p += Pkt
      }
      Mpeg1Ps.splitVideo(es.toByteArray, marks)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** MPEG-2 CRC-32 for PSI sections (polynomial 0x04C11DB7, init all
    * ones, NO reflection, NO final xor — not the zlib variant).
    */
  private[graft] def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    var crc = 0xffffffffL
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xffL) << 24
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04c11db7L) & 0xffffffffL
          else (crc << 1) & 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Write-side twin: wrap encoded access units into a transport stream
    * — PAT + PMT (program 1, stream_type 0x02 video on `videoPid`), one
    * PES per access unit (unbounded length 0, PTS on each), payloads
    * chunked into 184-byte packet slices with continuity counters, the
    * final partial slice right-justified behind adaptation-field
    * stuffing as §2.4.3.3 requires.
    */
  def mux(accessUnits: Seq[Array[Byte]], fps: Int = 25,
      videoPid: Int = 0x0100, pmtPid: Int = 0x1000): Array[Byte] = {
    require(accessUnits.nonEmpty, "at least one access unit")
    require(videoPid > 0x10 && videoPid < 0x1fff, s"video PID: $videoPid")
    require(pmtPid > 0x10 && pmtPid < 0x1fff && pmtPid != videoPid,
      s"PMT PID: $pmtPid")
    val out = new java.io.ByteArrayOutputStream()
    val cc = scala.collection.mutable.Map.empty[Int, Int]

    def section(body: Array[Byte]): Array[Byte] = {
      // body = table_id .. last byte before CRC, with section_length
      // already counting the CRC
      val crc = crc32(body, 0, body.length)
      body ++ Array[Byte]((crc >> 24).toByte, (crc >> 16).toByte,
        (crc >> 8).toByte, crc.toByte)
    }
    def psiPacket(pid: Int, sec: Array[Byte]): Unit = {
      val pl = new Array[Byte](Pkt)
      java.util.Arrays.fill(pl, 0xff.toByte)
      pl(0) = 0x47
      pl(1) = (0x40 | (pid >> 8)).toByte // PUSI set
      pl(2) = pid.toByte
      pl(3) = (0x10 | (cc.getOrElse(pid, 0) & 0xf)).toByte // payload only
      cc(pid) = cc.getOrElse(pid, 0) + 1
      pl(4) = 0 // pointer_field
      System.arraycopy(sec, 0, pl, 5, sec.length)
      out.write(pl)
    }
    // PAT: program 1 -> pmtPid
    psiPacket(0, section(Array[Byte](
      0x00, 0xb0.toByte, 13, // table_id, '1011' + section_length (9 + CRC)
      0x00, 0x01, // transport_stream_id
      0xc1.toByte, 0x00, 0x00, // version 0 current, section 0 of 0
      0x00, 0x01, // program_number 1
      (0xe0 | (pmtPid >> 8)).toByte, pmtPid.toByte)))
    // PMT: PCR on the video PID, one MPEG-2 video stream
    psiPacket(pmtPid, section(Array[Byte](
      0x02, 0xb0.toByte, 18, // table_id, section_length (14 + CRC)
      0x00, 0x01, // program_number
      0xc1.toByte, 0x00, 0x00,
      (0xe0 | (videoPid >> 8)).toByte, videoPid.toByte, // PCR_PID
      0xf0.toByte, 0x00, // program_info_length 0
      0x02, // stream_type: 13818-2 video
      (0xe0 | (videoPid >> 8)).toByte, videoPid.toByte,
      0xf0.toByte, 0x00))) // ES_info_length 0

    accessUnits.zipWithIndex.foreach { case (au, k) =>
      val pts = 90000L * (k + 1) / fps + 90000L
      val pes = new java.io.ByteArrayOutputStream()
      pes.write(Array[Byte](0, 0, 1, 0xe0.toByte, 0, 0)) // length 0: unbounded
      pes.write(0x80); pes.write(0x80); pes.write(5) // flags form, PTS only
      pes.write((0x2 << 4) | (((pts >> 30) & 0x7).toInt << 1) | 1)
      pes.write(((pts >> 22) & 0xff).toInt)
      pes.write((((pts >> 15) & 0x7f).toInt << 1) | 1)
      pes.write(((pts >> 7) & 0xff).toInt)
      pes.write((((pts & 0x7f).toInt) << 1) | 1)
      pes.write(au)
      val data = pes.toByteArray
      var off = 0
      var first = true
      while (off < data.length) {
        val remain = data.length - off
        val pl = new Array[Byte](Pkt)
        pl(0) = 0x47
        pl(1) = (((if (first) 0x40 else 0) | (videoPid >> 8))).toByte
        pl(2) = videoPid.toByte
        val c = cc.getOrElse(videoPid, 0) & 0xf
        cc(videoPid) = cc.getOrElse(videoPid, 0) + 1
        if (remain >= 184) {
          pl(3) = (0x10 | c).toByte // payload only
          System.arraycopy(data, off, pl, 4, 184)
          off += 184
        } else {
          // adaptation-field stuffing pushes the tail payload to the end
          pl(3) = (0x30 | c).toByte
          val afLen = 183 - remain
          pl(4) = afLen.toByte
          if (afLen > 0) {
            pl(5) = 0 // no flags
            var i = 6
            while (i < 5 + afLen) { pl(i) = 0xff.toByte; i += 1 }
          }
          System.arraycopy(data, off, pl, Pkt - remain, remain)
          off += remain
        }
        out.write(pl)
        first = false
      }
    }
    out.toByteArray
  }
}
