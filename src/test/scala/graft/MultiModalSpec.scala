package graft

import org.apache.spark.sql.functions._
import graft.ops.MultiModal

class MultiModalSpec extends SparkTestBase {

  import spark.implicits._

  private def blob(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

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

  test("WEBP dims: all three bitstream flavors, plus truncation; TIFF both byte orders") {
    // drive through the SHARED fixture (rows 9-14 are the new formats),
    // asserting the kernel recovers exactly the expected dims the
    // q_media_dims oracle reads from the fixture columns
    val got = MultiModal.withDimensions(Tables.mediaFixture(spark), "bytes")
      .filter(col("media_id") >= 9L)
      .select(col("media_id"), col("width"), col("height"),
        col("expected_width"), col("expected_height"))
      .collect()
    assert(got.length == 6)
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
      12L -> "tiff", 13L -> "tiff", 14L -> "webp"))
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
