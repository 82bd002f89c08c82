package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.Multimodal.VideoMeta

/** Video-container HEADER parsers and fixture writers (public specs;
  * no frame decoding anywhere — that seam stays behind the refusal in
  * [[Multimodal.extractFeatures]]).
  *
  * Every parser is defensive: any out-of-range size, truncated box, or
  * missing required element returns None, and the caller treats None
  * exactly like an unknown container (refusal, not a guess). The
  * writers emit minimal REAL containers — the same bytes a muxer would
  * start with — so the spec and the q161 oracle exercise the parsers on
  * genuine structure, not on mocks of themselves.
  */
private[graft] object Mp4Meta {

  /** ISO/IEC 14496-12 box walk: top-level `moov`, then `mvhd` (version
    * 0 or 1: timescale + duration) and the first `trak/tkhd` (width and
    * height as 16.16 fixed point in the box's last 8 bytes — the layout
    * offset differs between tkhd versions but the tail position does
    * not). duration_ms = duration * 1000 / timescale. */
  def parse(b: Array[Byte]): Option[VideoMeta] = {
    val moov = findBox(b, 0, b.length, "moov").getOrElse(return None)
    val (ms, me) = moov
    val mvhd = findBox(b, ms, me, "mvhd").getOrElse(return None)
    val (durMs) = {
      val (s, e) = mvhd
      if (e - s < 4) return None
      val v = b(s) & 0xff
      val (tsOff, durLen) = if (v == 1) (4 + 16, 8) else (4 + 8, 4)
      if (s + tsOff + 4 + durLen > e) return None
      val timescale = be32(b, s + tsOff)
      val duration =
        if (durLen == 8) be64(b, s + tsOff + 4) else be32(b, s + tsOff + 4)
      // duration is untrusted (64-bit in a v1 mvhd): duration * 1000
      // can overflow Long into a garbage/negative durationMs — such a
      // header hits the documented None refusal instead (ADVICE r9)
      if (timescale <= 0 || duration < 0 ||
        duration > Long.MaxValue / 1000L) return None
      duration * 1000L / timescale
    }
    val trak = findBox(b, ms, me, "trak").getOrElse(return None)
    val tkhd = findBox(b, trak._1, trak._2, "tkhd").getOrElse(return None)
    val (ts, te) = tkhd
    if (te - ts < 8) return None
    val w = be32(b, te - 8) >> 16
    val h = be32(b, te - 4) >> 16
    if (w <= 0 || h <= 0) return None
    Some(VideoMeta("mp4", durMs, w.toInt, h.toInt))
  }

  /** First box named `name` in [from, to): Some((bodyStart, bodyEnd)). */
  private def findBox(b: Array[Byte], from: Int, to: Int, name: String)
      : Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      var body = i + 8
      val end: Long =
        if (size32 == 1L) { // 64-bit largesize follows the type
          if (i + 16 > to) return None
          body = i + 16
          i + be64(b, i + 8)
        } else if (size32 == 0L) to // box runs to end of enclosing scope
        else i + size32
      if (end < body || end > to) return None
      if (typ == name) return Some((body, end.toInt))
      i = end.toInt
    }
    None
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
    v
  }

  /** Minimal real MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). Timescale
    * 1000, so duration units ARE milliseconds (round-trip exact). */
  def write(durationMs: Long, w: Int, h: Int): Array[Byte] = {
    // v0 mvhd/tkhd carry 32-bit durations: durationMs.toInt would
    // silently truncate beyond Int.MaxValue (~24.8 days at timescale
    // 1000), breaking the round-trip guarantee — refuse loudly instead
    // (ADVICE r9)
    require(durationMs >= 0 && durationMs <= Int.MaxValue,
      s"mp4 v0 mvhd duration is 32-bit: $durationMs ms out of range")
    val ftyp = box("ftyp", ascii("isom") ++ beI(0x200) ++ ascii("isom"))
    val mvhd = box("mvhd",
      beI(0) ++ beI(0) ++ beI(0) ++ beI(1000) ++ beI(durationMs.toInt) ++
        beI(0x00010000) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        identityMatrix ++ new Array[Byte](24) ++ beI(2))
    val tkhd = box("tkhd",
      beI(7) ++ beI(0) ++ beI(0) ++ beI(1) ++ beI(0) ++
        beI(durationMs.toInt) ++ new Array[Byte](8) ++
        new Array[Byte](8) ++ identityMatrix ++ beI(w << 16) ++ beI(h << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  /** Per-frame (absoluteByteOffset, byteSize) from the SAMPLE TABLES —
    * the real frame-extraction index every MP4 demuxer reads (stsz
    * sizes + stco chunk offsets), no pixel decode anywhere. Defensive
    * like [[parse]]: anything outside the subset this engine writes —
    * a non-trivial stsc (samples packed into shared chunks), count
    * mismatches, offsets/sizes past the file end — returns None and
    * the caller refuses rather than mis-slicing frame bytes. */
  def frameTable(b: Array[Byte]): Option[Seq[(Long, Long)]] = {
    val (ms, me) = findBox(b, 0, b.length, "moov").getOrElse(return None)
    val trak = findBox(b, ms, me, "trak").getOrElse(return None)
    val mdia = findBox(b, trak._1, trak._2, "mdia").getOrElse(return None)
    val minf = findBox(b, mdia._1, mdia._2, "minf").getOrElse(return None)
    val stbl = findBox(b, minf._1, minf._2, "stbl").getOrElse(return None)
    val (ss, se) = stbl
    // stsc must be the trivial 1:1 mapping (one sample per chunk) —
    // that is what [[writeWithSamples]] emits; shared chunks would
    // need the full chunk-run walk, refused loudly via None
    val stsc = findBox(b, ss, se, "stsc").getOrElse(return None)
    if (stsc._2 - stsc._1 != 4 + 4 + 12 ||
      be32(b, stsc._1 + 4) != 1L ||
      be32(b, stsc._1 + 8) != 1L || be32(b, stsc._1 + 12) != 1L)
      return None
    val stsz = findBox(b, ss, se, "stsz").getOrElse(return None)
    if (stsz._2 - stsz._1 < 12) return None
    val fixedSize = be32(b, stsz._1 + 4)
    val n = be32(b, stsz._1 + 8)
    if (n < 0 || n > (1 << 20)) return None // fixture-scale sanity bound
    val sizes: Seq[Long] =
      if (fixedSize != 0L) Seq.fill(n.toInt)(fixedSize)
      else {
        if (stsz._1 + 12 + 4 * n > stsz._2) return None
        (0 until n.toInt).map(i => be32(b, stsz._1 + 12 + 4 * i))
      }
    val stco = findBox(b, ss, se, "stco").getOrElse(return None)
    if (stco._2 - stco._1 < 8 || be32(b, stco._1 + 4) != n) return None
    if (stco._1 + 8 + 4 * n > stco._2) return None
    val offsets = (0 until n.toInt).map(i => be32(b, stco._1 + 8 + 4 * i))
    val table = offsets.zip(sizes)
    if (table.exists { case (o, s) => o < 0 || s < 0 || o + s > b.length })
      return None
    Some(table)
  }

  /** [[write]]'s sibling carrying a REAL sample table + mdat: the trak
    * gains mdia/minf/stbl with the trivial stsc (one sample per chunk),
    * per-sample stsz, and ABSOLUTE stco offsets into the appended mdat
    * — the moov is built twice (lengths don't depend on offset VALUES)
    * so the offsets are exact. [[frameTable]] + byte-slicing round-trip
    * these, which is what q181's closed-form oracle certifies.
    *
    * `codec` (r12): when set, stbl additionally leads with a full
    * 86-byte VisualSampleEntry in stsd declaring the sample format
    * fourcc — e.g. "png " (the registered QuickTime/MP4 codec FFmpeg's
    * `-c:v png` writes), which q190 uses to carry REAL decodable frame
    * payloads. [[frameTable]] looks boxes up by name, so the extra stsd
    * is transparent to it; q181's closed-form outputs (sizes, first
    * frame bytes) don't read offsets and stay byte-for-byte valid. */
  def writeWithSamples(durationMs: Long, w: Int, h: Int,
      frames: Seq[Array[Byte]], codec: Option[String] = None): Array[Byte] = {
    require(durationMs >= 0 && durationMs <= Int.MaxValue,
      s"mp4 v0 mvhd duration is 32-bit: $durationMs ms out of range")
    require(codec.forall(_.length == 4), s"codec fourcc must be 4 chars")
    val ftyp = box("ftyp", ascii("isom") ++ beI(0x200) ++ ascii("isom"))
    def moovFor(offsets: Seq[Int]): Array[Byte] = {
      val mvhd = box("mvhd",
        beI(0) ++ beI(0) ++ beI(0) ++ beI(1000) ++ beI(durationMs.toInt) ++
          beI(0x00010000) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
          identityMatrix ++ new Array[Byte](24) ++ beI(2))
      val tkhd = box("tkhd",
        beI(7) ++ beI(0) ++ beI(0) ++ beI(1) ++ beI(0) ++
          beI(durationMs.toInt) ++ new Array[Byte](8) ++
          new Array[Byte](8) ++ identityMatrix ++ beI(w << 16) ++ beI(h << 16))
      // full ISO 14496-12 VisualSampleEntry (86 bytes): fourcc,
      // 6 reserved + data_reference_index 1, 16 pre_defined/reserved,
      // width, height, 72 dpi ×2, reserved, frame_count 1, 32-byte
      // compressorname, depth 24, pre_defined -1
      val stsd = codec.map { fcc =>
        val entry = beI(86) ++ ascii(fcc) ++
          new Array[Byte](6) ++ Array[Byte](0, 1) ++
          new Array[Byte](16) ++
          Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++
          beI(0x00480000) ++ beI(0x00480000) ++ beI(0) ++
          Array[Byte](0, 1) ++ new Array[Byte](32) ++
          Array[Byte](0, 24) ++ Array[Byte](-1, -1)
        box("stsd", beI(0) ++ beI(1) ++ entry)
      }.getOrElse(Array.emptyByteArray)
      val stsc = box("stsc", beI(0) ++ beI(1) ++ beI(1) ++ beI(1) ++ beI(1))
      val stsz = box("stsz", beI(0) ++ beI(0) ++ beI(frames.length) ++
        frames.flatMap(f => beI(f.length)).toArray)
      val stco = box("stco", beI(0) ++ beI(offsets.length) ++
        offsets.flatMap(beI).toArray)
      val stbl = box("stbl", stsd ++ stsc ++ stsz ++ stco)
      box("moov", mvhd ++ box("trak",
        tkhd ++ box("mdia", box("minf", stbl))))
    }
    val moovLen = moovFor(Seq.fill(frames.length)(0)).length
    val mdatBody = frames.flatten.toArray
    val base = ftyp.length + moovLen + 8 // first frame byte inside mdat
    val offsets = frames.scanLeft(base)(_ + _.length).init
    ftyp ++ moovFor(offsets) ++ box("mdat", mdatBody)
  }

  /** The declared sample-format fourcc from stsd — how a demuxer picks
    * the frame decoder. None when no stsd is present (the pre-r12
    * metadata-only fixtures) or the box is malformed; q190 requires
    * "png " here BEFORE handing frame bytes to the PNG decoder, the
    * real dispatch step (a codec this engine cannot decode refuses
    * loudly instead of mis-decoding). */
  def sampleCodec(b: Array[Byte]): Option[String] = {
    val (ms, me) = findBox(b, 0, b.length, "moov").getOrElse(return None)
    val trak = findBox(b, ms, me, "trak").getOrElse(return None)
    val mdia = findBox(b, trak._1, trak._2, "mdia").getOrElse(return None)
    val minf = findBox(b, mdia._1, mdia._2, "minf").getOrElse(return None)
    val stbl = findBox(b, minf._1, minf._2, "stbl").getOrElse(return None)
    val (sd, sdEnd) = findBox(b, stbl._1, stbl._2, "stsd").getOrElse(return None)
    // version/flags(4) + entry_count(4) + entry size(4) + fourcc(4)
    if (sd + 16 > sdEnd || be32(b, sd + 4) < 1) return None
    Some(new String(b, sd + 12, 4, java.nio.charset.StandardCharsets.US_ASCII))
  }

  private def identityMatrix: Array[Byte] =
    beI(0x00010000) ++ beI(0) ++ beI(0) ++
      beI(0) ++ beI(0x00010000) ++ beI(0) ++
      beI(0) ++ beI(0) ++ beI(0x40000000)

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    beI(8 + body.length) ++ ascii(typ) ++ body

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def beI(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v).array()
}

private[graft] object MkvMeta {

  // Matroska/WebM element ids (raw, marker bits included)
  private val Ebml = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimecodeScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  /** EBML walk: Segment → Info(TimecodeScale, Duration) and Segment →
    * Tracks → TrackEntry → Video(PixelWidth, PixelHeight).
    * duration_ms = round(Duration × TimecodeScale / 10⁶) — Duration is
    * a float in TIMECODE units, TimecodeScale is ns per unit (default
    * 1,000,000 = 1 ms units). */
  def parse(b: Array[Byte]): Option[VideoMeta] = {
    val segment = find(b, 0, b.length, Segment).getOrElse(return None)
    val info = find(b, segment._1, segment._2, Info).getOrElse(return None)
    val tcScale = find(b, info._1, info._2, TimecodeScale)
      .map { case (s, e) => uint(b, s, e) }.getOrElse(1000000L)
    val durF = find(b, info._1, info._2, Duration)
      .map { case (s, e) => float(b, s, e).getOrElse(return None) }
      .getOrElse(return None)
    val tracks = find(b, segment._1, segment._2, Tracks).getOrElse(return None)
    val entry = find(b, tracks._1, tracks._2, TrackEntry).getOrElse(return None)
    val video = find(b, entry._1, entry._2, Video).getOrElse(return None)
    val w = find(b, video._1, video._2, PixelWidth)
      .map { case (s, e) => uint(b, s, e) }.getOrElse(return None)
    val h = find(b, video._1, video._2, PixelHeight)
      .map { case (s, e) => uint(b, s, e) }.getOrElse(return None)
    if (tcScale <= 0 || durF < 0 || w <= 0 || h <= 0) return None
    val ms = math.round(durF * tcScale / 1e6)
    Some(VideoMeta("mkv/webm", ms, w.toInt, h.toInt))
  }

  /** First element with raw id `want` in [from, to): (bodyStart, bodyEnd). */
  private def find(b: Array[Byte], from: Int, to: Int, want: Long)
      : Option[(Int, Int)] = {
    var i = from
    while (i < to) {
      val (id, i1) = vint(b, i, to, keepMarker = true).getOrElse(return None)
      val (sz, i2) = vint(b, i1, to, keepMarker = false).getOrElse(return None)
      val end = i2 + sz
      if (end > to || sz < 0) return None
      if (id == want) return Some((i2, end.toInt))
      i = end.toInt
    }
    None
  }

  /** EBML varint at `i`: (value, indexAfter). Marker-kept form for ids,
    * marker-stripped for sizes. */
  private def vint(b: Array[Byte], i: Int, to: Int, keepMarker: Boolean)
      : Option[(Long, Int)] = {
    if (i >= to) return None
    val first = b(i) & 0xff
    if (first == 0) return None
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (i + len > to || len > 8) return None
    var v: Long = if (keepMarker) first else first & ((1 << (8 - len)) - 1)
    var k = 1
    while (k < len) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
    Some((v, i + len))
  }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private def float(b: Array[Byte], s: Int, e: Int): Option[Double] =
    (e - s) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(uint(b, s, e)))
      case _ => None
    }

  /** Minimal real Matroska: EBML header + Segment(Info(TimecodeScale
    * 10⁶ ns = 1 ms units, Duration float64) + Tracks(TrackEntry(Video(
    * PixelWidth, PixelHeight)))). */
  def write(durationMs: Long, w: Int, h: Int): Array[Byte] = {
    def el(id: Long, body: Array[Byte]): Array[Byte] = {
      val idBytes = rawBytes(id)
      // size as a 1- or 8-byte vint (1-byte covers bodies < 127)
      val szBytes =
        if (body.length < 127) Array((0x80 | body.length).toByte)
        else {
          val a = new Array[Byte](8)
          a(0) = 0x01
          var v = body.length.toLong
          var k = 7
          while (k >= 1) { a(k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
          a
        }
      idBytes ++ szBytes ++ body
    }
    def uintBody(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >> (8 * n)) != 0) n += 1
      val a = new Array[Byte](n)
      var k = 0
      while (k < n) { a(n - 1 - k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
      a
    }
    val f64 = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      .putDouble(durationMs.toDouble).array()
    val info = el(Info,
      el(TimecodeScale, uintBody(1000000L)) ++ el(Duration, f64))
    val video = el(Video,
      el(PixelWidth, uintBody(w.toLong)) ++ el(PixelHeight, uintBody(h.toLong)))
    val tracks = el(Tracks, el(TrackEntry, video))
    el(Ebml, Array.empty[Byte]) ++ el(Segment, info ++ tracks)
  }

  private def rawBytes(id: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (id >> (8 * n)) != 0) n += 1
    val a = new Array[Byte](n)
    var k = 0
    while (k < n) { a(n - 1 - k) = ((id >> (8 * k)) & 0xff).toByte; k += 1 }
    a
  }
}

private[graft] object AviMeta {

  /** RIFF walk to the `hdrl` LIST's `avih` main header (56-byte body,
    * little-endian): duration_ms = dwMicroSecPerFrame × dwTotalFrames
    * / 1000; dwWidth/dwHeight at offsets 32/36. */
  def parse(b: Array[Byte]): Option[VideoMeta] = {
    if (b.length < 12) return None
    var i = 12 // past RIFF size 'AVI '
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (id == "LIST" && sz >= 4 &&
        new String(b, i + 8, 4, java.nio.charset.StandardCharsets.US_ASCII) == "hdrl") {
        // chunks inside the LIST body (after the 4-byte list type)
        var j = i + 12
        val end = i + 8 + sz.toInt
        while (j + 8 <= end) {
          val cid = new String(b, j, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val csz = le32(b, j + 4)
          if (csz < 0 || j + 8 + csz > end) return None
          if (cid == "avih") {
            if (csz < 40) return None
            val usPerFrame = le32(b, j + 8)
            val frames = le32(b, j + 8 + 16)
            val w = le32(b, j + 8 + 32)
            val h = le32(b, j + 8 + 36)
            // both factors are untrusted uint32 (≤ 2^32−1): the product
            // can exceed Long.MaxValue (~1.8e19 > 9.2e18). 10^9 bounds
            // (≥ 1000 s/frame × ≥ 1 year of frames — corrupt, not
            // video) keep the product ≤ 10^18, so overflow hits the
            // None refusal as the contract promises (ADVICE r9)
            if (usPerFrame <= 0 || frames < 0 || w <= 0 || h <= 0 ||
              usPerFrame > 1000000000L || frames > 1000000000L) return None
            return Some(VideoMeta("avi",
              usPerFrame * frames / 1000L, w.toInt, h.toInt))
          }
          j += 8 + csz.toInt + (csz.toInt & 1) // chunks are word-aligned
        }
        return None
      }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Minimal real AVI: RIFF('AVI ' LIST('hdrl' avih)). One-ms frames
    * (dwMicroSecPerFrame = 1000, dwTotalFrames = durationMs) keep the
    * round-trip exact. */
  def write(durationMs: Long, w: Int, h: Int): Array[Byte] = {
    // dwTotalFrames is uint32 AND parse() refuses frame counts above
    // 10^9 (overflow guard) — writes beyond that would silently break
    // the round-trip, so refuse loudly (ADVICE r9)
    require(durationMs >= 0 && durationMs <= 1000000000L,
      s"avi dwTotalFrames at 1 ms/frame: $durationMs ms out of range")
    val avih = new Array[Byte](56)
    val bb = ByteBuffer.wrap(avih).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 1000) // dwMicroSecPerFrame
    bb.putInt(16, durationMs.toInt) // dwTotalFrames
    bb.putInt(24, 1) // dwStreams
    bb.putInt(32, w)
    bb.putInt(36, h)
    val chunk = ascii("avih") ++ leI(56) ++ avih
    val list = ascii("LIST") ++ leI(4 + chunk.length) ++ ascii("hdrl") ++ chunk
    ascii("RIFF") ++ leI(4 + list.length) ++ ascii("AVI ") ++ list
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def leI(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
}
