package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media row: id + opaque binary payload (image/audio/video bytes). */
final case class MediaRaw(doc_id: Long, payload: Array[Byte])

/** Decoded media metadata — what a real decoder would emit.
  * `decode_status` names the parser that produced the geometry
  * (`png`/`jpeg`/`gif`/`bmp`/`wav`/`tiff`/`mp4`/`webp`/`flac`) or `stub` for
  * containers this build cannot parse — the documented codec stub is queryable observability,
  * not a silent fake (same no-silent-caps discipline as
  * `SkewGuard.droppedBuckets`). */
final case class MediaMeta(doc_id: Long, n_bytes: Long, sha256: String,
    width: Int, height: Int, n_frames: Int, decode_status: String)

/** Pure-JVM header parsers for the containers whose geometry lives in a
  * fixed-layout (or walkable) header — no codec library needed: PNG,
  * JPEG, GIF, BMP, TIFF (image dimensions), WAV (channels / bit depth /
  * sample-frame count) and ISO-BMFF MP4/MOV (track geometry + sample
  * count). Anything beyond headers (pixel/sample decode, other
  * containers) stays stubbed.
  */
object MediaCodecs {

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * width/height are the big-endian words at offsets 16/20. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16).toInt, be32(b, 20).toInt))
    else None

  /** JPEG: walk the marker segments from SOI until a start-of-frame
    * (SOF0..15 except the DHT/JPG/DAC holes C4/C8/CC), whose payload is
    * precision(1) height(2) width(2). Returns None on truncated or
    * non-JPEG bytes — never throws. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1 // fill
      val marker = b(j + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i = j + 2 // standalone marker, no length word
      } else {
        if (j + 3 >= b.length) return None
        val len = be16(b, j + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof)
          return if (j + 8 < b.length) Some((be16(b, j + 7), be16(b, j + 5)))
          else None
        if (marker == 0xda) return None // entropy stream, SOF was missing
        i = j + 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: the logical screen descriptor directly follows the
    * 6-byte signature — width/height are little-endian u16 at offsets
    * 6/8. (Geometry only; per-frame enumeration needs an LZW sub-block
    * walk, which is decode territory, not header territory.) */
  def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** BMP: "BM" + 12-byte file header, then a BITMAPINFOHEADER whose
    * size word is ≥40 — width/height are little-endian i32 at offsets
    * 18/22 (height may be negative for top-down rows: take |h|). The
    * ancient BITMAPCOREHEADER (size 12, u16 dims) is handled too;
    * per-branch length guards carry each header's own minimum. */
  def bmpDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 18 && b(0) == 'B' && b(1) == 'M') {
      val hdr = le32(b, 14)
      if (hdr >= 40 && b.length >= 26)
        Some((le32(b, 18).toInt, math.abs(le32(b, 22).toInt)))
      else if (hdr == 12 && b.length >= 22)
        Some((le16(b, 18), le16(b, 20)))
      else None
    } else None

  /** WAV (RIFF/WAVE): walks the chunk list for `fmt ` (channels at 10,
    * bits-per-sample at 22, block-align at 20 within the chunk) and
    * `data` (payload size). Returns (channels, bitsPerSample,
    * sampleFrames = dataBytes / blockAlign) — audio's exact analogue of
    * (width, height, n_frames). Never throws on truncated input. */
  def wavMeta(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, bits, blockAlign
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val o = i.toInt
      val id = new String(b.slice(o, o + 4), "US-ASCII")
      val sz = le32(b, o + 4) // unsigned u32 as Long: 0..2^32-1
      if (id == "fmt " && i + 8 + 16 <= b.length)
        fmt = Some((le16(b, o + 10), le16(b, o + 22), le16(b, o + 20)))
      else if (id == "data") dataBytes = sz
      // long cursor arithmetic: a corrupt/huge size field walks past the
      // end and terminates the loop instead of wrapping the cursor into
      // a stall or a negative index (header-parse promises never-throw)
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    fmt.collect { case (ch, bits, ba) if ba > 0 && dataBytes >= 0 =>
      (ch, bits, math.min(dataBytes / ba, Int.MaxValue.toLong).toInt)
    }
  }

  /** FLAC: `fLaC` magic, then metadata blocks — the spec REQUIRES the
    * first to be STREAMINFO (type 0, 34 bytes), whose packed 8-byte
    * field at offset 10 carries sample rate (20 bits), channels−1 (3),
    * bits-per-sample−1 (5) and total samples (36). Returns (channels,
    * bits, total sample frames), the same audio triple as [[wavMeta]].
    * Never throws. */
  def flacMeta(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') return None
    if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34) return None
    def u(i: Int): Long = b(8 + i) & 0xffL
    val channels = ((u(12) >> 1) & 0x7).toInt + 1
    val bps = (((u(12) & 1) << 4) | (u(13) >> 4)).toInt + 1
    val totalSamples = ((u(13) & 0xf) << 32) |
      (u(14) << 24) | (u(15) << 16) | (u(16) << 8) | u(17)
    Some((channels, bps,
      math.min(totalSamples, Int.MaxValue.toLong).toInt))
  }

  /** WebP (RIFF/WEBP): the first chunk after the RIFF header decides
    * the flavor — `VP8X` (extended) carries a 24-bit LE canvas size
    * minus one; `VP8L` (lossless) packs 14-bit dims minus one into the
    * 4 bytes after its 0x2F signature; `VP8 ` (lossy) holds 14-bit
    * dims behind the 0x9D 0x01 0x2A sync code. Same RIFF outer shell
    * as WAV, distinguished by the `WEBP` form type. Never throws. */
  def webpDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 20 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'E' || b(10) != 'B' ||
      b(11) != 'P') return None
    val p = 20 // first chunk payload (id at 12, size at 16)
    new String(b.slice(12, 16), "US-ASCII") match {
      case "VP8X" if b.length >= p + 10 =>
        def u24(o: Int): Int =
          (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16)
        Some((u24(p + 4) + 1, u24(p + 7) + 1))
      case "VP8L" if b.length >= p + 5 && (b(p) & 0xFF) == 0x2F =>
        val (b1, b2) = (b(p + 1) & 0xFF, b(p + 2) & 0xFF)
        val (b3, b4) = (b(p + 3) & 0xFF, b(p + 4) & 0xFF)
        Some((1 + (b1 | ((b2 & 0x3F) << 8)),
          1 + ((b2 >> 6) | (b3 << 2) | ((b4 & 0x0F) << 10))))
      case "VP8 " if b.length >= p + 10 && (b(p + 3) & 0xFF) == 0x9D &&
          (b(p + 4) & 0xFF) == 0x01 && (b(p + 5) & 0xFF) == 0x2A =>
        Some((le16(b, p + 6) & 0x3FFF, le16(b, p + 8) & 0x3FFF))
      case _ => None
    }
  }

  /** TIFF: byte-order mark `II`/`MM` + magic 42 + first-IFD offset; the
    * IFD is a u16 entry count then 12-byte entries (tag u16, type u16,
    * count u32, value field). ImageWidth/ImageLength are tags 256/257,
    * stored inline as SHORT(3) or LONG(4) — left-justified in the value
    * field per the spec, so a SHORT reads at entry offset 8 in either
    * byte order. Never throws on truncated/corrupt input. */
  def tiffDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I'
    val bigE = b(0) == 'M' && b(1) == 'M'
    if (!le && !bigE) return None
    def u16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
    def u32(o: Int): Long = if (le) le32(b, o) else be32(b, o)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val base = ifd.toInt
    val n = u16(base)
    var w = -1L
    var h = -1L
    var i = 0
    while (i < n && base + 2 + 12 * i + 12 <= b.length) {
      val e = base + 2 + 12 * i
      // only count==1 entries store the value inline at e+8; count>1
      // stores an OFFSET there, which would be misread as the dimension
      val v: Long = (u16(e + 2), u32(e + 4)) match {
        case (3, 1L) => u16(e + 8) // SHORT, single value
        case (4, 1L) => u32(e + 8) // LONG, single value
        case _ => -1L
      }
      u16(e) match {
        case 256 => w = v
        case 257 => h = v
        case _ => ()
      }
      i += 1
    }
    if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some((w.toInt, h.toInt))
    else None
  }

  /** Child boxes of an ISO-BMFF byte range as (type, contentStart,
    * contentEnd): u32 size + 4cc type per box, size 1 → u64 largesize
    * follows, size 0 → box runs to the range end. Stops (returning what
    * it has) on any malformed size — never throws, never loops. */
  private def bmffChildren(b: Array[Byte], s0: Long,
      e0: Long): Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    var p = s0
    var guard = 0
    while (p + 8 <= e0 && guard < 4096) {
      guard += 1
      val sz0 = be32(b, p.toInt)
      val typ = new String(b, p.toInt + 4, 4, "US-ASCII")
      var hdr = 8L
      val sz: Long =
        if (sz0 == 1L) {
          if (p + 16 > e0) return out.result()
          hdr = 16L
          be64(b, p.toInt + 8)
        } else if (sz0 == 0L) e0 - p
        else sz0
      if (sz < hdr || p + sz > e0) return out.result()
      out += ((typ, p + hdr, p + sz))
      p += sz
    }
    out.result()
  }

  /** ISO-BMFF (MP4/MOV/M4A): requires a leading `ftyp` box, then walks
    * `moov`. Geometry is the first `trak` whose `tkhd` carries nonzero
    * 16.16-fixed width/height (presentation size; version 0 and 1
    * layouts both handled); the frame count is that trak's
    * `mdia/minf/stbl/stsz` sample_count, defaulting to 1 when the
    * sample table is absent/truncated. Audio-only files (every tkhd
    * zero-sized) report (0, 0, frames of the first trak). */
  def mp4Meta(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 16) return None
    val top = bmffChildren(b, 0L, b.length.toLong)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    val traks = bmffChildren(b, moov._2, moov._3).filter(_._1 == "trak")

    def sampleCount(trak: (String, Long, Long)): Int = {
      var kids = bmffChildren(b, trak._2, trak._3)
      for (boxName <- Seq("mdia", "minf", "stbl")) {
        kids = kids.find(_._1 == boxName)
          .map(k => bmffChildren(b, k._2, k._3))
          .getOrElse(return 1)
      }
      kids.find(_._1 == "stsz").collect {
        case (_, cs, ce) if cs + 12 <= ce && ce <= b.length =>
          math.min(be32(b, cs.toInt + 8), Int.MaxValue.toLong).toInt
      }.filter(_ > 0).getOrElse(1)
    }

    def tkhdDims(trak: (String, Long, Long)): Option[(Int, Int)] =
      bmffChildren(b, trak._2, trak._3).find(_._1 == "tkhd")
        .flatMap { case (_, cs, ce) =>
          // content: version(1) flags(3), then v0 fields total 72 /
          // v1 fields total 84 before the 16.16 width/height pair
          val off = cs + (if (b(cs.toInt) == 1) 88L else 76L)
          if (off + 8 <= ce && off + 8 <= b.length) {
            val w = (be32(b, off.toInt) >> 16).toInt
            val h = (be32(b, off.toInt + 4) >> 16).toInt
            if (w > 0 && h > 0) Some((w, h)) else None
          } else None
        }

    traks.view.flatMap(t => tkhdDims(t).map(d => (d._1, d._2,
      sampleCount(t)))).headOption
      .orElse(traks.headOption.map(t => (0, 0, sampleCount(t))))
  }
}

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, decoded partition-by-partition.
  *
  * The Spark-side shape is the real thing — binary column, typed
  * `Dataset[MediaRaw] → mapPartitions → Dataset[MediaMeta]`, per-partition
  * batching (a real decoder amortizes codec init across a partition,
  * exactly like a Pandas-UDF batch would). Header decode is REAL for
  * PNG, JPEG, GIF, BMP and TIFF geometry, WAV audio metadata, and
  * MP4/MOV track geometry + sample counts
  * ([[MediaCodecs]] — pure header parsing, no library); any other
  * container falls back to [[stubDecode]]'s deterministic fake, since
  * the media libraries are not in this container. Swap the fallback for
  * a JNI/javacv call and nothing else changes.
  *
  * Scale notes: payloads never pass through a shuffle here (decode is a
  * narrow map); metadata extraction prunes the binary column as soon as
  * possible so downstream stages move kilobytes, not media bytes.
  */
object Multimodal {

  /** Attach a binary payload column (fixtures: the document text's UTF-8
    * bytes stand in for media bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decoder — deterministic fake of an image decode for payloads
    * whose container [[MediaCodecs]] cannot parse. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length.toLong
    (64 + (n % 512).toInt, 64 + ((n * 7) % 512).toInt, 1 + (n % 8).toInt)
  }

  /** Header decode: real parsing for PNG/JPEG/GIF/BMP/TIFF/WebP
    * dimensions (single-frame), WAV/FLAC audio (channels, bit depth,
    * sample frames) and MP4/MOV video (track geometry, sample count);
    * stub fallback for any other container. */
  def decodeHeader(payload: Array[Byte]): (Int, Int, Int) =
    decodeHeaderTagged(payload)._1

  /** [[decodeHeader]] plus the name of the parser that won — `stub`
    * marks rows whose metadata is the deterministic fake, so a user can
    * count/filter how much of a corpus carried REAL metadata. */
  def decodeHeaderTagged(payload: Array[Byte]): ((Int, Int, Int), String) =
    MediaCodecs.pngDims(payload).map(d => ((d._1, d._2, 1), "png"))
      .orElse(MediaCodecs.jpegDims(payload).map(d => ((d._1, d._2, 1), "jpeg")))
      .orElse(MediaCodecs.gifDims(payload).map(d => ((d._1, d._2, 1), "gif")))
      .orElse(MediaCodecs.bmpDims(payload).map(d => ((d._1, d._2, 1), "bmp")))
      .orElse(MediaCodecs.wavMeta(payload).map((_, "wav")))
      .orElse(MediaCodecs.tiffDims(payload).map(d => ((d._1, d._2, 1), "tiff")))
      .orElse(MediaCodecs.mp4Meta(payload).map((_, "mp4")))
      .orElse(MediaCodecs.webpDims(payload).map(d => ((d._1, d._2, 1), "webp")))
      .orElse(MediaCodecs.flacMeta(payload).map((_, "flac")))
      .getOrElse((stubDecode(payload), "stub"))

  /** One sampled frame: stub "decode" of frame `frame_idx` of a media
    * payload (a real decoder would seek + decode; the fake is a
    * deterministic per-frame digest so the distributed shape is
    * oracle-checkable). */
  final case class MediaFrame(doc_id: Long, frame_idx: Int,
      frame_md5: String)

  /** Frame sampling over the binary column: one output row per frame
    * (up to `maxFrames`), the video-ish UDTF shape. The frame count comes
    * from the stub header decode; each frame row carries a digest of
    * (payload, frame_idx). Narrow generate — payload bytes never shuffle,
    * and the binary column is dropped before anything wide. */
  def sampleFrames(docs: DataFrame, maxFrames: Int = 4): DataFrame =
    withPayload(docs)
      .select(col("doc_id"),
        least(lit(maxFrames),
          lit(1) + pmod(length(col("payload")), lit(8))).as("__n"),
        col("payload"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("__n") - 1)).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(concat(decode(col("payload"), "UTF-8"), lit("#"),
          col("frame_idx").cast("string"))).as("frame_md5"))

  /** Resized media: id + stub-resized dimensions + digest of the
    * (fake) resized payload. */
  final case class MediaResized(doc_id: Long, width: Int, height: Int,
      sha256: String)

  /** Per-partition "resize" over the binary column: the geometry math
    * (fit within maxDim preserving aspect) is real; producing the resized
    * bytes is the stubbed codec step (digest stands in). Same narrow
    * mapPartitions shape as [[extractMeta]] — swap the stub for a real
    * scaler and nothing else changes. */
  def resize(docs: DataFrame, maxDim: Int): Dataset[MediaResized] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("payload")).as[MediaRaw]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val (w, h, _) = decodeHeader(r.payload)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val (nw, nh) = (math.max(1, (w * scale).toInt),
            math.max(1, (h * scale).toInt))
          md.reset()
          md.update(r.payload)
          md.update(s"#${nw}x$nh".getBytes("UTF-8"))
          MediaResized(r.doc_id, nw, nh,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
  }

  /** Extracted feature vector: id + fixed-width float embedding. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Per-partition feature extraction: a deterministic `dims`-wide
    * vector from the payload bytes (byte histogram folded per band,
    * scaled to [0,1]) — the stub for a real vision/audio encoder. The
    * output column is `ArrayType(FloatType)`, directly consumable by the
    * Similarity operators (cosine top-k, LSH, IVF). */
  def extractFeatures(docs: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("payload")).as[MediaRaw]
      .mapPartitions { it =>
        it.map { r =>
          val acc = new Array[Long](dims)
          var i = 0
          while (i < r.payload.length) {
            acc(i % dims) += r.payload(i) & 0xff
            i += 1
          }
          val n = math.max(1, r.payload.length)
          MediaFeatures(r.doc_id,
            acc.map(s => (s.toDouble / n / 255.0).toFloat))
        }
      }
  }

  /** Per-partition metadata extraction over the binary column. */
  def extractMeta(docs: DataFrame): Dataset[MediaMeta] =
    extractMetaFromPayload(
      withPayload(docs).select(col("doc_id"), col("payload")))

  /** Same extraction for a frame that already carries `(doc_id, payload)`
    * — the entry point when real media bytes are ingested directly. */
  def extractMetaFromPayload(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[MediaRaw]
      .mapPartitions { it =>
        // one digest per partition ≙ one codec context per batch
        val md = MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val ((w, h, frames), status) = decodeHeaderTagged(r.payload)
          md.reset()
          val sha = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaMeta(r.doc_id, r.payload.length.toLong, sha, w, h, frames,
            status)
        }
      }
  }
}
