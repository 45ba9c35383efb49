package graft

import org.apache.spark.sql.functions._

import graft.ops.{MediaCodecs, Multimodal, Similarity}

/** Multimodal plumbing beyond the oracle-checked m1/m2: resize geometry,
  * feature extraction shape/determinism, and features feeding the
  * similarity operators end-to-end. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("resize fits within maxDim preserving aspect, deterministically") {
    val out = Multimodal.resize(docs, maxDim = 100).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.width <= 100 && r.height <= 100 && r.width >= 1 && r.height >= 1)
    }
    val again = Multimodal.resize(docs, maxDim = 100).collect()
    assert(out.map(_.sha256).toSeq === again.map(_.sha256).toSeq)
  }

  test("extractMeta reads true dimensions from planted PNG and JPEG headers") {
    import graft.ops.MediaCodecs
    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
      bb.putInt(w).putInt(h)
      bb.put(Array[Byte](8, 6, 0, 0, 0)) // depth/color/comp/filter/interlace
      bb.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
      bb.put(Array(0xff, 0xd8).map(_.toByte))                   // SOI
      bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16)      // APP0
      bb.put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
      bb.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17)      // SOF0
      bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      bb.put(3.toByte).put(new Array[Byte](9))                  // components
      bb.put(Array(0xff, 0xd9).map(_.toByte))                   // EOI
      bb.array()
    }
    assert(MediaCodecs.pngDims(png(123, 45)) === Some((123, 45)))
    assert(MediaCodecs.jpegDims(jpeg(640, 480)) === Some((640, 480)))
    assert(MediaCodecs.pngDims("plain text".getBytes) === None)
    assert(MediaCodecs.jpegDims("plain text".getBytes) === None)
    assert(MediaCodecs.jpegDims(Array(0xff, 0xd8, 0xff).map(_.toByte)) === None)

    val media = Seq(
      (1L, png(123, 45)), (2L, jpeg(640, 480)),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val metas = Multimodal.extractMetaFromPayload(media)
      .collect().sortBy(_.doc_id)
    assert((metas(0).width, metas(0).height, metas(0).n_frames) === (123, 45, 1))
    assert((metas(1).width, metas(1).height, metas(1).n_frames) === (640, 480, 1))
    // unparseable container falls back to the deterministic stub
    val (sw, sh, sf) = Multimodal.stubDecode("not an image at all".getBytes("UTF-8"))
    assert((metas(2).width, metas(2).height, metas(2).n_frames) === (sw, sh, sf))
    // the winning parser is queryable per row — stub rows self-identify
    assert(metas.map(_.decode_status).toSeq === Seq("png", "jpeg", "stub"))
  }

  test("GIF, BMP and WAV headers parse for real") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val gif = "GIF89a".getBytes("US-ASCII") ++ le16(320) ++ le16(200) ++
      Array.fill(3)(0.toByte)
    assert(MediaCodecs.gifDims(gif) === Some((320, 200)))
    assert(MediaCodecs.gifDims("GIF00a??".getBytes) === None)

    // BITMAPINFOHEADER (size 40), height negative = top-down
    val bmp = "BM".getBytes ++ le32(200) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(800) ++ le32(-600)
    assert(MediaCodecs.bmpDims(bmp) === Some((800, 600)))
    assert(MediaCodecs.bmpDims("BMxx".getBytes) === None)

    // RIFF/WAVE: fmt (PCM stereo 16-bit, blockAlign 4) then 400-byte data
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16)
    val data = "data".getBytes ++ le32(400) ++ Array.fill(400)(0.toByte)
    val wavBody = fmt ++ data
    val wav = "RIFF".getBytes ++ le32(4 + wavBody.length) ++
      "WAVE".getBytes ++ wavBody
    // (channels=2, bits=16, sampleFrames = 400/4 = 100)
    assert(MediaCodecs.wavMeta(wav) === Some((2, 16, 100)))
    assert(MediaCodecs.wavMeta("RIFFxxxxAVI ".getBytes) === None)

    // and they flow through the typed decode path end-to-end
    val media = Seq((1L, gif), (2L, bmp), (3L, wav))
      .toDF("doc_id", "payload")
    val metas = Multimodal.extractMetaFromPayload(media)
      .collect().sortBy(_.doc_id)
    assert((metas(0).width, metas(0).height, metas(0).n_frames) === (320, 200, 1))
    assert((metas(1).width, metas(1).height, metas(1).n_frames) === (800, 600, 1))
    assert((metas(2).width, metas(2).height, metas(2).n_frames) === (2, 16, 100))
    assert(metas.map(_.decode_status).toSeq === Seq("gif", "bmp", "wav"))
  }

  test("TIFF headers parse for real, both byte orders, SHORT and LONG") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    // little-endian, LONG-typed dims: II*\0, IFD at 8, 2 entries
    val tiffLe = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(2) ++
      (le16(256) ++ le16(4) ++ le32(1) ++ le32(1920)) ++ // ImageWidth
      (le16(257) ++ le16(4) ++ le32(1) ++ le32(1080)) ++ // ImageLength
      le32(0)
    assert(MediaCodecs.tiffDims(tiffLe) === Some((1920, 1080)))

    // big-endian, SHORT-typed dims (value left-justified in the field)
    val tiffBe = "MM".getBytes ++ be16(42) ++ be32(8) ++
      be16(2) ++
      (be16(256) ++ be16(3) ++ be32(1) ++ be16(640) ++ be16(0)) ++
      (be16(257) ++ be16(3) ++ be32(1) ++ be16(480) ++ be16(0)) ++
      be32(0)
    assert(MediaCodecs.tiffDims(tiffBe) === Some((640, 480)))

    // wrong magic / truncated / missing tags → None, never a throw
    assert(MediaCodecs.tiffDims("II??xxxx".getBytes) === None)
    assert(MediaCodecs.tiffDims(tiffLe.take(10)) === None)
    val noDims = "II".getBytes ++ le16(42) ++ le32(8) ++ le16(1) ++
      (le16(259) ++ le16(3) ++ le32(1) ++ le32(1)) ++ le32(0)
    assert(MediaCodecs.tiffDims(noDims) === None)

    // count > 1 stores an OFFSET in the value field, not the value: a
    // dims entry with count=2 must be rejected (None), never misread
    // as width/height = the offset bytes
    val multiCount = "II".getBytes ++ le16(42) ++ le32(8) ++
      le16(2) ++
      (le16(256) ++ le16(4) ++ le32(2) ++ le32(38)) ++ // count=2: offset!
      (le16(257) ++ le16(4) ++ le32(2) ++ le32(46)) ++
      le32(0) ++
      le32(1920) ++ le32(1921) ++ le32(1080) ++ le32(1081)
    assert(MediaCodecs.tiffDims(multiCount) === None)
  }

  test("MP4 (ISO-BMFF) box walk: tkhd geometry and stsz frame count") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, content: Array[Byte]): Array[Byte] =
      be32(8 + content.length) ++ typ.getBytes("US-ASCII") ++ content

    // tkhd v0: version/flags, 20 bytes of times/ids, 16 bytes of
    // layer/volume, 36-byte matrix, then 16.16 width/height
    def tkhd(w: Int, h: Int): Array[Byte] = box("tkhd",
      new Array[Byte](4) ++ new Array[Byte](20) ++ new Array[Byte](16) ++
        new Array[Byte](36) ++ (be16(w) ++ be16(0)) ++ (be16(h) ++ be16(0)))
    def stsz(n: Int): Array[Byte] = box("stsz",
      new Array[Byte](4) ++ be32(0) ++ be32(n))
    val trak = box("trak", tkhd(1280, 720) ++
      box("mdia", box("minf", box("stbl", stsz(300)))))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(512)) ++
      box("moov", box("mvhd", new Array[Byte](100)) ++ trak)
    assert(MediaCodecs.mp4Meta(mp4) === Some((1280, 720, 300)))

    // audio-only: zero-sized tkhd → (0, 0, sampleCount)
    val audioTrak = box("trak", tkhd(0, 0) ++
      box("mdia", box("minf", box("stbl", stsz(441)))))
    val m4a = box("ftyp", "M4A ".getBytes ++ be32(0)) ++
      box("moov", audioTrak)
    assert(MediaCodecs.mp4Meta(m4a) === Some((0, 0, 441)))

    // no leading ftyp / truncated / non-BMFF → None, never a throw
    assert(MediaCodecs.mp4Meta(box("moov", trak)) === None)
    assert(MediaCodecs.mp4Meta(mp4.take(30)) === None)
    assert(MediaCodecs.mp4Meta("plain text that is long enough".getBytes)
      === None)

    // end-to-end: the new lanes are queryable via decode_status
    val media = Seq((1L, mp4)).toDF("doc_id", "payload")
    val meta = Multimodal.extractMetaFromPayload(media).collect().head
    assert((meta.width, meta.height, meta.n_frames) === (1280, 720, 300))
    assert(meta.decode_status === "mp4")
  }

  test("WebP headers parse for real: VP8X canvas, VP8L packed, lossy VP8") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le24(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    def riff(chunk: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le16(4 + 8 + payload.length) ++ le16(0) ++
        "WEBP".getBytes ++ chunk.getBytes("US-ASCII") ++
        le16(payload.length) ++ le16(0) ++ payload

    // VP8X: flags+reserved (4), then 24-bit canvas minus one, each dim
    val vp8x = riff("VP8X",
      new Array[Byte](4) ++ le24(1920 - 1) ++ le24(1080 - 1))
    assert(MediaCodecs.webpDims(vp8x) === Some((1920, 1080)))

    // VP8L: 0x2F signature, then 14-bit (w-1, h-1) packed low-first
    val w = 800; val h = 600
    val packed = (w - 1) | ((h - 1) << 14)
    val vp8l = riff("VP8L", Array(0x2F.toByte,
      (packed & 0xff).toByte, ((packed >> 8) & 0xff).toByte,
      ((packed >> 16) & 0xff).toByte, ((packed >> 24) & 0xff).toByte))
    assert(MediaCodecs.webpDims(vp8l) === Some((800, 600)))

    // lossy VP8: 3-byte frame tag, sync 9D 01 2A, 14-bit dims
    val vp8 = riff("VP8 ", new Array[Byte](3) ++
      Array(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++ le16(320) ++ le16(240))
    assert(MediaCodecs.webpDims(vp8) === Some((320, 240)))

    // WAV keeps its RIFF lane (form type decides), junk stays None
    assert(MediaCodecs.webpDims(
      "RIFF????WAVEfmt 0000000000000000".getBytes) === None)
    assert(MediaCodecs.webpDims(vp8x.take(15)) === None)

    // end-to-end: the webp lane is queryable via decode_status
    val media = Seq((1L, vp8l)).toDF("doc_id", "payload")
    val meta = Multimodal.extractMetaFromPayload(media).collect().head
    assert((meta.width, meta.height, meta.decode_status) === (800, 600, "webp"))
  }

  test("FLAC STREAMINFO parses for real: channels, bits, total samples") {
    // fLaC + STREAMINFO block (type 0, len 34): the packed field at
    // streaminfo offset 10 carries rate(20)/chan-1(3)/bps-1(5)/samples(36)
    def flac(channels: Int, bps: Int, samples: Long,
        rate: Int = 44100): Array[Byte] = {
      val si = new Array[Byte](34)
      si(10) = ((rate >> 12) & 0xff).toByte
      si(11) = ((rate >> 4) & 0xff).toByte
      si(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) |
        ((bps - 1) >> 4)).toByte
      si(13) = ((((bps - 1) & 0xf) << 4) | ((samples >> 32) & 0xf)).toInt.toByte
      si(14) = ((samples >> 24) & 0xff).toByte
      si(15) = ((samples >> 16) & 0xff).toByte
      si(16) = ((samples >> 8) & 0xff).toByte
      si(17) = (samples & 0xff).toByte
      "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ si
    }
    assert(MediaCodecs.flacMeta(flac(2, 16, 1234567L)) ===
      Some((2, 16, 1234567)))
    assert(MediaCodecs.flacMeta(flac(1, 24, 99L)) === Some((1, 24, 99)))
    assert(MediaCodecs.flacMeta(flac(8, 32, 0L)) === Some((8, 32, 0)))
    // 36-bit total-samples field clips to Int.MaxValue, never overflows
    assert(MediaCodecs.flacMeta(flac(2, 16, (1L << 36) - 1)) ===
      Some((2, 16, Int.MaxValue)))
    // a first block that is NOT STREAMINFO violates the spec: None
    val bad = flac(2, 16, 9L); bad(4) = 0x04 // VORBIS_COMMENT first
    assert(MediaCodecs.flacMeta(bad) === None)
    assert(MediaCodecs.flacMeta("fLa".getBytes) === None)
    assert(MediaCodecs.flacMeta(flac(2, 16, 9L).take(20)) === None)
    // end-to-end: queryable via decode_status
    val media = Seq((1L, flac(2, 16, 4242L))).toDF("doc_id", "payload")
    val meta = Multimodal.extractMetaFromPayload(media).collect().head
    assert((meta.width, meta.height, meta.n_frames, meta.decode_status) ===
      (2, 16, 4242, "flac"))
  }

  test("extracted features are fixed-width, in [0,1], and similarity-ready") {
    val feats = Multimodal.extractFeatures(docs, dims = 8)
    val rows = feats.collect()
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(_.features.forall(f => f >= 0f && f <= 1f)))

    // features flow straight into the similarity surface
    val emb = feats.toDF()
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val top = Similarity.bruteForceTopK(emb, queryId = rows.head.doc_id, k = 3)
      .collect()
    assert(top.length === 3)
    assert(top.forall(r => !r.isNullAt(1)))
  }
}
