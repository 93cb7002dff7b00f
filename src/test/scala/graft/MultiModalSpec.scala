package graft

import org.apache.spark.sql.functions._
import graft.ops.MultiModal

class MultiModalSpec extends SparkTestBase {

  import spark.implicits._

  import MediaBytes.{blob, box4, be32, le16, le32}

  private val media = Seq(
    (1L, blob(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46)),
    (2L, blob(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)),
    (3L, blob(0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0, 0)),
    (4L, "RIFF".getBytes ++ blob(0, 0, 0, 0) ++ "WAVE".getBytes),
    (5L, blob(0, 0, 0, 0x20) ++ "ftypisom".getBytes),
    (6L, "%PDF-1.7".getBytes),
    (7L, "just some text".getBytes("UTF-8")),
    (8L, "BM".getBytes ++ blob(0, 0, 0, 0))
  ).toDF("media_id", "bytes")

  test("sniffFormat detects containers by magic bytes") {
    val got = MultiModal
      .mediaMeta(media, "bytes")
      .select(col("media_id"), col("format"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got == Map(
      1L -> "jpeg", 2L -> "png", 3L -> "gif", 4L -> "wav",
      5L -> "mp4", 6L -> "pdf", 7L -> "unknown", 8L -> "bmp"))
  }

  test("mediaMeta sizes and digests are exact") {
    val row = MultiModal.mediaMeta(media.filter(col("media_id") === 7L), "bytes").collect()(0)
    assert(row.getAs[Int]("n_bytes") == 14)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("just some text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("content_sha") == expected)
  }

  test("fakeEmbedding: deterministic, fixed dim, values in [-1,1], shape-compatible downstream") {
    val emb = media.select(col("media_id").as("vec_id"), MultiModal.fakeEmbedding(col("bytes"), 16).as("embedding"))
    val a = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.values.forall(v => v.length == 16 && v.forall(x => x >= -1f && x <= 1f)))
    assert(a(1L) != a(2L)) // content-sensitive
    // flows into the similarity stack unchanged
    val top = graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1L, 3)
    assert(top.collect().length == 3)
  }

  test("frameSample emits n binary frames covering the payload") {
    val big = Seq((1L, Array.tabulate[Byte](10000)(i => (i % 251).toByte))).toDF("id", "bytes")
    val frames = big.select(MultiModal.frameSample(col("bytes"), n = 4, frameBytes = 100).as("f"))
      .select(explode(col("f")).as("frame"))
      .collect()
      .map(_.getAs[Array[Byte]](0))
    assert(frames.length == 4)
    assert(frames.forall(_.length == 100))
    assert(frames.distinct.length == 4) // spaced, not repeated
  }

  test("withDimensions parses PNG/GIF/BMP headers and walks JPEG markers to the SOF") {
    // minimal real headers: magic + the bytes the parser actually reads
    val png = blob(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      blob(0, 0, 0, 0x0d) ++ "IHDR".getBytes ++
      blob(0, 0, 0x02, 0x80) ++ blob(0, 0, 0x01, 0xe0) // 640 x 480 BE
    val gif = "GIF89a".getBytes ++ blob(0x40, 0x01, 0xf0, 0x00) // 320 x 240 LE
    val bmp = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x28, 0, 0, 0) ++
      blob(0x00, 0x04, 0, 0) ++ blob(0x00, 0x03, 0, 0) // 1024 x 768 LE @18/22
    // JPEG: SOI, APP0 (skipped via its length), then SOF0 with h=600 w=800
    val jpg = blob(0xff, 0xd8) ++
      blob(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00) ++ // APP0 len 4
      blob(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x02, 0x58, 0x03, 0x20, 0x01, 0x11, 0x00)
    val truncatedPng = blob(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val rows = Seq(
      (1L, png), (2L, gif), (3L, bmp), (4L, jpg),
      (5L, truncatedPng), (6L, "not media".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val got = MultiModal.withDimensions(rows, "bytes")
      .select(col("media_id"), col("width"), col("height"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2)))))
      .toMap
    assert(got == Map(
      1L -> Some((640, 480)),
      2L -> Some((320, 240)),
      3L -> Some((1024, 768)),
      4L -> Some((800, 600)),
      5L -> None,
      6L -> None))
  }

  test("BMP dims: legacy BITMAPCOREHEADER, top-down negative height, unknown DIB") {
    // BITMAPCOREHEADER: DIB size 12 at offset 14, uint16 dims at 18/20
    val core = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x0c, 0, 0, 0) ++
      blob(0x40, 0x01) ++ blob(0xf0, 0x00) ++ new Array[Byte](6) // 320 x 240
    // top-down BITMAPINFOHEADER: height is NEGATIVE int32 → |height| pixels
    val topDown = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x28, 0, 0, 0) ++
      blob(0x00, 0x04, 0, 0) ++ blob(0x00, 0xfd, 0xff, 0xff) // 1024 x -768
    // a DIB header size that is neither the core nor the info family
    val unknownDib = "BM".getBytes ++ new Array[Byte](12) ++ blob(0x10, 0, 0, 0) ++
      blob(0x40, 0x01, 0, 0) ++ blob(0xf0, 0x00, 0, 0)
    val got = MultiModal.withDimensions(
        Seq((1L, core), (2L, topDown), (3L, unknownDib)).toDF("media_id", "bytes"), "bytes")
      .select(col("media_id"), col("width"), col("height"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2)))))
      .toMap
    assert(got == Map(1L -> Some((320, 240)), 2L -> Some((1024, 768)), 3L -> None))
  }

  test("WEBP/TIFF/MP4 dims through the shared fixture; sniffing keeps pace") {
    // drive through the SHARED fixture (rows 9-23 are the non-trivial
    // formats: WEBP flavors, TIFF byte orders, MP4 video/audio/headless,
    // WAV and FLAC variants — the audio rows expecting NULL dims),
    // asserting the kernel recovers exactly the expected dims the
    // q_media_dims oracle reads from the fixture columns
    val got = MultiModal.withDimensions(Tables.mediaFixture(spark), "bytes")
      .filter(col("media_id") >= 9L)
      .select(col("media_id"), col("width"), col("height"),
        col("expected_width"), col("expected_height"))
      .collect()
    assert(got.length == 15)
    got.foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(3)) &&
        Option(r.get(2)) == Option(r.get(4)),
        s"media ${r.getLong(0)}: parsed (${r.get(1)},${r.get(2)}) " +
          s"!= expected (${r.get(3)},${r.get(4)})")
    }
    // format sniffing keeps pace with the parser
    val fmts = MultiModal.mediaMeta(Tables.mediaFixture(spark), "bytes")
      .filter(col("media_id") >= 9L)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(fmts == Map(9L -> "webp", 10L -> "webp", 11L -> "webp",
      12L -> "tiff", 13L -> "tiff", 14L -> "webp",
      15L -> "mp4", 16L -> "mp4", 17L -> "mp4",
      18L -> "wav", 19L -> "wav", 20L -> "wav", 21L -> "wav",
      22L -> "flac", 23L -> "flac"))
  }

  test("avMeta: WAV chunk walk — rates, duration from the data size, null contract") {
    import MediaBytes.{wavFile, wavFmt}
    // canonical 44.1 kHz stereo 16-bit, one second of payload bytes
    val canonical = wavFile(wavFmt(2, 44100, 176400, 16) ++
      "data".getBytes ++ le32(176400) ++ new Array[Byte](176400))
    // streamed WAV: the data SIZE field is the truth even when the
    // buffer holds less (a sniffing scan reads prefixes, not payloads)
    val streamed = wavFile(wavFmt(1, 16000, 32000, 16) ++
      "data".getBytes ++ le32(64000) ++ new Array[Byte](10))
    // an odd-sized junk chunk BEFORE fmt: the walk must skip its pad byte
    val padded = wavFile("junk".getBytes ++ le32(3) ++ blob(1, 2, 3, 0) ++
      wavFmt(2, 48000, 192000, 16) ++ "data".getBytes ++ le32(96000) ++ blob(0))
    // zero byte rate: rates are reported, duration cannot be
    val zeroRate = wavFile(wavFmt(2, 44100, 0, 16) ++
      "data".getBytes ++ le32(1000) ++ blob(0))
    // a RIFF/WAVE shell with neither fmt nor data parses to nothing
    val shell = wavFile("junk".getBytes ++ le32(4) ++ blob(0, 0, 0, 0))
    // bytes AFTER the declared RIFF end (an appended tag / concatenated
    // file) are not chunks: this trailer parses as a 'data' chunk with a
    // garbage size exactly at the aligned walk position, and must lose
    // to the real container's figures
    val trailingJunk = canonical ++ "data".getBytes ++ le32(999999999L)
    val got = MultiModal.withAvMeta(
        Seq((1L, canonical), (2L, streamed), (3L, padded), (4L, zeroRate), (5L, shell),
          (6L, trailingJunk))
          .toDF("media_id", "bytes"), "bytes")
      .select(col("media_id"), col("av_container"), col("duration_ms"),
        col("sample_rate"), col("channels"), col("bit_depth"), col("video_width"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
      .toMap
    assert(got(1L) == ((Some("wav"), Some(1000L), Some(44100), Some(2), Some(16), None)))
    assert(got(2L) == ((Some("wav"), Some(2000L), Some(16000), Some(1), Some(16), None)))
    assert(got(3L) == ((Some("wav"), Some(500L), Some(48000), Some(2), Some(16), None)))
    assert(got(4L) == ((Some("wav"), None, Some(44100), Some(2), Some(16), None)))
    assert(got(5L) == ((None, None, None, None, None, None)))
    assert(got(6L) == got(1L), "chunks past the declared RIFF end must not win")
  }

  test("avMeta: FLAC STREAMINFO fixed offsets, unknown-length sentinel, malformed first block") {
    import MediaBytes.flac
    // 36-bit total samples: the high nibble of byte 21 must participate
    // (2^32 samples at 48 kHz ≈ 89 478 485 ms — a wrong 32-bit read
    // would be off by exactly the high bits)
    val huge = flac(48000, 2, 16, 1L << 32)
    // first metadata block is VORBIS_COMMENT (type 4), not STREAMINFO:
    // the spec forbids it, and fixed-offset figures would be garbage
    val wrongBlock = flac(44100, 2, 16, 44100L, firstBlockType = 4)
    // magic but a buffer too short for STREAMINFO
    val truncated = "fLaC".getBytes ++ Array[Byte](0x00.toByte, 0, 0, 34)
    val got = MultiModal.withAvMeta(
        Seq((1L, huge), (2L, wrongBlock), (3L, truncated))
          .toDF("media_id", "bytes"), "bytes")
      .select(col("media_id"), col("av_container"), col("duration_ms"),
        col("sample_rate"), col("channels"), col("bit_depth"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(got(1L) == ((Some("flac"), Some((1L << 32) * 1000L / 48000),
      Some(48000), Some(2), Some(16))))
    assert(got(2L) == ((None, None, None, None, None)))
    assert(got(3L) == ((None, None, None, None, None)))
  }

  test("avMeta: MP4 mvhd/tkhd both versions, unknown-duration sentinel, hostile boxes") {
    val ftyp = box4("ftyp", "isom".getBytes ++ be32(1))
    // the fixture's v0 file: timescale 1000, duration 90 000 units, 1920×1080
    val v0 = Tables.mediaFixture(spark)
      .filter(col("media_id") === 15L).collect()(0).getAs[Array[Byte]]("bytes")
    // v1 layouts: 64-bit mvhd times (timescale 600, 120 600 units →
    // 201 000 ms) and the longer tkhd prefix (width offset +12)
    val mvhdV1 = box4("mvhd", blob(1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(600) ++ be32(0) ++ be32(120600))
    val tkhdV1Trak = box4("trak", box4("tkhd",
      blob(1, 0, 0, 7) ++ new Array[Byte](32) ++ new Array[Byte](16) ++
        new Array[Byte](36) ++ be32(1280L << 16) ++ be32(720L << 16)))
    val v1 = ftyp ++ box4("moov", mvhdV1 ++ tkhdV1Trak)
    // v0 all-ones duration = "unknown" per spec → NULL, not 4 294 967 ms
    val unknownDur = ftyp ++ box4("moov",
      box4("mvhd", blob(0, 0, 0, 0) ++ new Array[Byte](8) ++ be32(1000) ++
        be32(0xffffffffL)) ++ tkhdV1Trak)
    // hostile sizes: a box claiming less than its own header, and one
    // claiming past the buffer — both are data, not crashes
    val tinyBox = ftyp ++ be32(3) ++ "moov".getBytes
    val hugeBox = ftyp ++ be32(0xfffffff0L) ++ "moov".getBytes
    // size == 0: the spec's box-extends-to-EOF form must still parse
    val mvhdV0 = box4("mvhd", blob(0, 0, 0, 0) ++ new Array[Byte](8) ++
      be32(1000) ++ be32(90000))
    val moovToEof = {
      val body = mvhdV0 ++ tkhdV1Trak
      ftyp ++ be32(0) ++ "moov".getBytes ++ body
    }
    // v1 duration too large for the ms conversion (duration·1000 would
    // overflow Long): absent, not a wrapped-negative garbage figure —
    // the dims next to it still parse
    val overflowDur = ftyp ++ box4("moov",
      box4("mvhd", blob(1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(1) ++ be32(0x70000000L) ++ be32(0)) ++ tkhdV1Trak)
    // an unusable leading trak (empty tkhd payload) must be SKIPPED, not
    // abort the scan — the valid video trak behind it still answers
    val emptyTkhd = ftyp ++ box4("moov",
      mvhdV0 ++ box4("trak", box4("tkhd", Array.empty[Byte])) ++ tkhdV1Trak)
    // tkhd dims are UNSIGNED 16.16: a top-bit width is a (weird) figure,
    // not a malformed file
    val bigDim = ftyp ++ box4("moov", mvhdV0 ++ box4("trak", box4("tkhd",
      blob(0, 0, 0, 7) ++ new Array[Byte](20) ++ new Array[Byte](16) ++
        new Array[Byte](36) ++ be32(0x80000000L) ++ be32(1L << 16))))
    val got = MultiModal.withAvMeta(
        Seq((1L, v0), (2L, v1), (3L, unknownDur), (4L, tinyBox), (5L, hugeBox),
          (6L, moovToEof), (7L, overflowDur), (8L, emptyTkhd), (9L, bigDim))
          .toDF("media_id", "bytes"), "bytes")
      .select(col("media_id"), col("av_container"), col("duration_ms"),
        col("sample_rate"), col("video_width"), col("video_height"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(got(1L) == ((Some("mp4"), Some(90000L), None, Some(1920), Some(1080))))
    assert(got(2L) == ((Some("mp4"), Some(201000L), None, Some(1280), Some(720))))
    assert(got(3L) == ((Some("mp4"), None, None, Some(1280), Some(720))))
    assert(got(4L) == ((None, None, None, None, None)))
    assert(got(5L) == ((None, None, None, None, None)))
    assert(got(6L) == ((Some("mp4"), Some(90000L), None, Some(1280), Some(720))))
    assert(got(7L) == ((Some("mp4"), None, None, Some(1280), Some(720))))
    assert(got(8L) == ((Some("mp4"), Some(90000L), None, Some(1280), Some(720))))
    assert(got(9L) == ((Some("mp4"), Some(90000L), None, Some(32768), Some(1))))
  }

  test("hostile TIFF payloads yield NULL, never a crash or garbage") {
    // IFD offset 0x7FFFFFFF: the bounds check must not integer-overflow
    // into an out-of-bounds read (corrupt containers are data)
    val hugeIfd = blob(0x49, 0x49, 0x2a, 0x00, 0xff, 0xff, 0xff, 0x7f)
    // count=2 dim entries store a FILE OFFSET in the value slot — the
    // parser must refuse, not emit the offsets as dimensions
    val offsetDims = "II".getBytes ++ blob(0x2a, 0x00) ++ blob(0x08, 0, 0, 0) ++
      blob(0x02, 0x00) ++
      blob(0x00, 0x01, 0x04, 0x00, 0x02, 0, 0, 0, 0x22, 0, 0, 0) ++ // 256 LONG count=2
      blob(0x01, 0x01, 0x04, 0x00, 0x02, 0, 0, 0, 0x2a, 0, 0, 0) ++ // 257 LONG count=2
      blob(0, 0, 0, 0)
    val got = MultiModal.withDimensions(
        Seq((1L, hugeIfd), (2L, offsetDims)).toDF("media_id", "bytes"), "bytes")
      .select(col("media_id"), col("width"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("docBlobs round-trips text bytes (the fixture's opaque payload)") {
    val one = MultiModal.docBlobs(Tables.documents(spark, sf001)).limit(1).collect()(0)
    val orig = Tables.documents(spark, sf001)
      .filter(col("doc_id") === one.getLong(0)).collect()(0).getAs[String]("text")
    assert(new String(one.getAs[Array[Byte]]("bytes"), "UTF-8") == orig)
  }

  test("batchedEncode: real batch shape, deterministic under partitioning, downstream-compatible") {
    val blobs = MultiModal.docBlobs(Tables.documents(spark, sf001)).limit(150)
    val out = MultiModal.batchedEncode(blobs, "doc_id", "bytes", dim = 8, batchSize = 32)
    val rows = out.collect()
    assert(rows.length == 150)
    // the encoder really sees batches: every batch ≤ batchSize, and at
    // least one FULL batch per partition with ≥ batchSize rows (the
    // per-batch dispatch a GPU encoder amortizes against)
    assert(rows.forall(_.getAs[Int]("batch_n") <= 32))
    assert(rows.exists(_.getAs[Int]("batch_n") == 32),
      "no full batch formed — the grouping is per-row, not batched")
    // fixed dim, finite values in [-1, 1]
    rows.foreach { r =>
      val e = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(e.size == 8)
      assert(e.forall(v => v >= -1.0f && v <= 1.0f))
    }
    // deterministic across partitionings (ids keep their embeddings)
    val repart = MultiModal
      .batchedEncode(blobs.repartition(7), "doc_id", "bytes", dim = 8, batchSize = 32)
      .collect()
    def byId(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("embedding").toSeq).toMap
    assert(byId(rows) == byId(repart))
    // NULL payloads are dropped, not crashed on
    val withNull = blobs.unionByName(
      Seq((9999L, null.asInstanceOf[Array[Byte]], "en")).toDF("doc_id", "bytes", "lang"))
    assert(MultiModal.batchedEncode(withNull, "doc_id", "bytes", 8, 32).count() == 150)
    // shape-compatible with the similarity stack: brute-force top-k runs
    val emb = out.select(col("doc_id").as("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    val topk = graft.ops.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", rows.head.getLong(0), 5)
    assert(topk.count() == 5)
  }

  test("resizeStub keeps the binary->binary projection contract incl. NULL-for-NULL") {
    val df = Seq(
      (1L, "abcdefghij".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "bytes")
    val out = df.select(col("id"), MultiModal.resizeStub(col("bytes"), 2, 3).as("resized"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("resized"))).toMap
    assert(out(1L).exists(_.length == 6))
    assert(out(2L).isEmpty)
    intercept[IllegalArgumentException](MultiModal.resizeStub(col("bytes"), 0, 3))
  }
}
