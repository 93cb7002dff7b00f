package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity-search contracts: a plain-Scala brute-force cosine top-k
  * over the embeddings fixture compared exactly against the DataFrame
  * plan (the independent check behind the SQL oracle), plus recall
  * floors for the LSH and IVF scale paths in the regimes they are built
  * for. */
class SimilaritySpec extends SparkTestBase {

  private val k = 10
  private val queryId = 0L

  /** The index root's live generation directory (Generations layout),
    * scheme-stripped so java.io.File assertions can walk it. */
  private def genDir(path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    graft.ops.Generations
      .currentDir(root.getFileSystem(spark.sessionState.newHadoopConf()), root)
      .toUri.getPath
  }

  /** (id, vector) pairs of the fixture, driver-side. */
  private lazy val vecs: Array[(Long, Array[Float])] =
    Tables
      .embeddings(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-k by (cosine desc, id asc) in plain Scala. */
  private lazy val expected: Seq[(Long, Double)] = {
    val q = vecs.find(_._1 == queryId).get._2
    vecs
      .filter(_._1 != queryId)
      .map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k)
      .toSeq
  }

  test("bruteForceTopK matches plain-Scala cosine oracle exactly") {
    val got = Similarity
      .bruteForceTopK(Tables.embeddings(spark, sf001), "vec_id", "embedding", queryId, k)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq
    assert(got.map(_._1) == expected.map(_._1), "neighbor ids / order differ")
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9, s"cosine drift: got $g expected $e")
    }
  }

  test("lshTopK recall >= 0.9 on clustered data with default params") {
    // The LSH use case: near-duplicate neighborhoods (cosine ≳ 0.9).
    // Deterministic synthetic clusters: 10 centers, 20 members each,
    // member = center + small noise → intra-cluster cosine ≈ 0.98.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    val data = (0 until 10).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 20).map { m =>
        val v = center.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat)
        (c * 20L + m, v)
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val q = data.find(_._1 == 0L).get._2
    val truth = data
      .filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k)
      .map(_._1)
      .toSet
    val got = Similarity
      .lshTopK(df, "vec_id", "embedding", queryId = 0L, k = k)
      .collect()
      .map(_.getLong(0))
      .toSet
    val recall = truth.count(got.contains).toDouble / k
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (got ${got.toSeq.sorted})")
  }

  test("lshTopK matches brute force on the fixture when bands are tuned to its regime") {
    // The fixture's vectors are near-random (top-10 cosine ≈ 0.27-0.33,
    // measured) — the regime where banding must be dense to recall
    // anything. 24 bands × 3 bits measures recall 1.0 here (grid-probed;
    // the Gaussian-hyperplane theory value is optimistic for the
    // hash-derived uniform planes). This exercises the signature join +
    // dedup + re-rank path end-to-end on real parquet input.
    val got = Similarity
      .lshTopK(Tables.embeddings(spark, sf001), "vec_id", "embedding", queryId, k,
        bands = 24, bitsPerBand = 3)
      .collect()
      .map(_.getLong(0))
      .toSet
    val recall = expected.map(_._1).count(got.contains).toDouble / k
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (got ${got.toSeq.sorted})")
  }

  test("lshTopK knownDim skips detection and answers identically") {
    // the detect-once convention (the trainers' knownDim, extended to
    // the per-probe callers r17): passing the corpus dim must change
    // nothing but the skipped aggregate pass
    val emb = Tables.embeddings(spark, sf001)
    val dim = Similarity.detectDim(emb, "embedding")
    assert(dim > 0)
    val detected = Similarity
      .lshTopK(emb, "vec_id", "embedding", queryId, k, bands = 24, bitsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val known = Similarity
      .lshTopK(emb, "vec_id", "embedding", queryId, k, bands = 24, bitsPerBand = 3,
        knownDim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(known == detected)
  }

  test("ivfTopK matches brute force on the fixture at the declared (k=8, nProbe=6)") {
    // Near-random fixture geometry: the true top-10 scatters across
    // buckets, so the declared query probes 6 of 8 (grid-probed: exact
    // equality at every SF). Clustered data — IVF's real regime — needs
    // only nProbe=1 (next test).
    val got = Similarity
      .ivfTopK(Tables.embeddings(spark, sf001), "vec_id", "embedding", queryId, k,
        nCentroids = 8, nProbe = 6)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq
    assert(got.map(_._1) == expected.map(_._1), "neighbor ids / order differ")
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9, s"cosine drift: got $g expected $e")
    }
  }

  test("ivfTopK recall >= 0.9 on clustered data probing a SINGLE bucket") {
    // IVF's sweet spot: clustered corpora, where the query's cluster maps
    // to one centroid bucket and nProbe=1 reads ~1/k of the corpus.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 64
    val data = (0 until 8).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 25).map { m =>
        val v = center.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat)
        (c * 25L + m, v)
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val q = data.find(_._1 == 0L).get._2
    val truth = data
      .filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k)
      .map(_._1)
      .toSet
    val got = Similarity
      .ivfTopK(df, "vec_id", "embedding", queryId = 0L, k = k,
        nCentroids = 8, nProbe = 1)
      .collect()
      .map(_.getLong(0))
      .toSet
    val recall = truth.count(got.contains).toDouble / k
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (got ${got.toSeq.sorted})")
  }

  test("ivfTopK with a NULL query vector returns empty, not an NPE") {
    import spark.implicits._
    val df = Seq(
      (0L, null.asInstanceOf[Array[Float]]),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(df, "vec_id", "embedding", queryId = 0L, k = 5).count() == 0)
  }

  test("persisted IVF index: probe is partition-pruned and equals the in-memory ivfTopK") {
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    Similarity.writeIvfIndex(emb, "embedding", centroids, path)
    // bucket-partitioned directories on disk (≤ k; a trained centroid may
    // legitimately attract no fixture vectors)
    val bucketDirs =
      new java.io.File(s"${genDir(path)}/base").listFiles()
        .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty && bucketDirs.length <= 8)
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeIvfIndex(
      spark, path, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId))
    // the scan carries a partition filter on bucket — directory-level
    // pruning, not a post-scan filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queryId, k, nCentroids = 8, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == mem)
    // (6 of 8 = 75% sits exactly AT the dense threshold, so the probe
    // above also exercises the root-read short-circuit — the isin guard
    // keeps the PartitionFilters assertion and the answer equality.)
    // nProbe == nlist, the fully-dense corner: one root read, answers
    // equal the brute-force scan over the whole index
    val all = Similarity.probeIvfIndex(
      spark, path, "vec_id", "embedding", qVec, centroids, k,
      nProbe = centroids.length, excludeId = Some(queryId))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queryId, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all == brute,
      "probing every bucket must equal brute force over the corpus")
  }

  test("quantized IVF index: smaller on disk, pruned probe, high top-k overlap") {
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val fDir = java.nio.file.Files.createTempDirectory("graft-ivf-f").toString
    val qDir = java.nio.file.Files.createTempDirectory("graft-ivf-q").toString
    Similarity.writeIvfIndex(emb, "embedding", centroids, fDir)
    Similarity.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, qDir)
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    // the index payload shrinks materially (int8 codes vs float vectors;
    // parquet encoding keeps it from a pure 4x, but it must be well
    // under the float index)
    assert(bytes(qDir) < bytes(fDir) * 0.6,
      s"quantized ${bytes(qDir)} vs float ${bytes(fDir)}")
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeIvfIndexQuantized(
      spark, qDir, "vec_id", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    val approx = probed.collect().map(_.getLong(0)).toSet
    val exact = Similarity.probeIvfIndex(
      spark, fDir, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId)).collect().map(_.getLong(0)).toSet
    assert((approx & exact).size >= k - 2,
      s"overlap ${(approx & exact).size}/$k too low")
    // a FLOAT ingester pointed at the quantized root must be refused AT
    // STREAM START (layout check against the base's parquet footer) —
    // before any batch commits offsets whose rows would then brick every
    // probe and compaction on the root
    import spark.implicits._
    val strayCkpt = java.nio.file.Files.createTempDirectory("graft-ivf-q-stray").toString
    val stray = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    stray.addData(Seq((888888L, qVec)))
    val refusal = intercept[IllegalArgumentException] {
      Similarity.ingestIvfIndexStream(
        stray.toDF().toDF("vec_id", "embedding"), "embedding", centroids, qDir, strayCkpt)
    }
    assert(refusal.getMessage.contains("does not match"), refusal.getMessage)
    // nothing was written: the probe keeps serving the base unchanged
    val afterRefusal = Similarity.probeIvfIndexQuantized(
      spark, qDir, "vec_id", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId)).collect().map(_.getLong(0)).toSet
    assert(afterRefusal == approx)
    // and an EMPTY query degrades to NULL scores, the cosine posture —
    // not an exception out of the kernel's non-empty-reference require
    val emptyQ = Similarity.probeIvfIndexQuantized(
      spark, qDir, "vec_id", Array.empty[Float], centroids, k, nProbe = 6).collect()
    assert(emptyQ.nonEmpty && emptyQ.forall(_.isNullAt(1)))
    // BACKSTOP: a mismatched streamed/ that exists anyway (hand-written,
    // or from a build predating the start-time guard) must fail the
    // probe's union LOUDLY — a silent drop or coercion here would
    // un-protect every pre-guard index on disk
    Seq((999999L, qVec)).toDF("vec_id", "embedding")
      .withColumn("bucket", lit(0))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(genDir(qDir) + "/streamed")
    intercept[org.apache.spark.sql.AnalysisException] {
      Similarity.probeIvfIndexQuantized(
        spark, qDir, "vec_id", qVec, centroids, k, nProbe = 6,
        excludeId = Some(queryId)).collect()
    }
  }

  test("int8Cosine kernel equals the interpreted HOF dequantization bit-for-bit") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val qVec = vecs.find(_._1 == queryId).get._2
    // a zero vector (NULL codes) and a ragged vector ride along: the
    // kernel must go NULL exactly where the HOF formulation does
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((777777L, Array.fill(64)(0f)), (777778L, qVec.take(10)))
        .toDF("vec_id", "embedding"))
    val q = graft.functions.native.quantizeInt8(col("embedding"))
    val staged = corpus.select(col("vec_id"), q.as("_q"))
    val hof = staged.select(
      col("vec_id"),
      graft.functions.native.cosineSim(
        transform(col("_q.codes"),
          c => (c.cast("double") * col("_q.scale") / 127.0).cast("float")),
        typedLit(qVec.toSeq)).as("s"))
    val kern = staged.select(
      col("vec_id"),
      graft.functions.native.int8Cosine(col("_q.codes"), col("_q.scale"), qVec).as("s"))
    val both = hof.join(kern, "vec_id")
    assert(both.count() == corpus.count())
    val diverged = both
      .filter(!(hof("s") <=> kern("s"))) // null-safe: both-NULL agrees
      .collect()
    assert(diverged.isEmpty, s"kernel diverged from the HOF model: ${diverged.mkString(",")}")
  }

  test("quantized IVF ingest: typed appends visible, equal to a rebuild, folded by compaction") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-qi").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-qi-ck").toString
    Similarity.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, dir)
    val qVec = vecs.find(_._1 == queryId).get._2
    def probe(d: String): Seq[(Long, Double)] =
      Similarity.probeIvfIndexQuantized(
        spark, d, "vec_id", qVec, centroids, k, nProbe = 8,
        excludeId = Some(queryId))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // append an exact copy of the query vector under a fresh id: the
    // quantized ingester must encode it through the SAME layout pass as
    // the batch writer, and the probe must surface it at the top
    val s = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    s.addData(Seq((888888L, qVec)))
    val q = Similarity.ingestIvfIndexStreamQuantized(
      s.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", centroids, dir, ckpt)
    try q.processAllAvailable() finally q.stop()
    val after = probe(dir)
    assert(after.head._1 == 888888L, s"appended near-dup must rank first: $after")
    // streamed rows equal the batch writer's computation: an index
    // REBUILT over corpus + appended row probes identically
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-qi2").toString
    Similarity.writeIvfIndexQuantized(
      emb.select(col("vec_id"), col("embedding"))
        .union(Seq((888888L, qVec)).toDF("vec_id", "embedding")),
      "vec_id", "embedding", centroids, dir2)
    assert(probe(dir2) == after, "append == rebuild for the quantized layout")
    // compaction folds streamed/ into the next generation's base: answers
    // unchanged, and a second compaction finds nothing to fold
    assert(Similarity.compactIndex(spark, dir, Seq("bucket")))
    assert(probe(dir) == after, "compaction must preserve probe answers")
    assert(!Similarity.compactIndex(spark, dir, Seq("bucket")),
      "second compaction must be a no-op (streamed/ was folded)")
  }

  test("typed ingest restart: same-checkpoint resume passes the layout guard, appends exactly once") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-qr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-qr-ck").toString
    Similarity.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, dir)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    def start() = Similarity.ingestIvfIndexStreamQuantized(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", centroids, dir, ckpt)
    val v = vecs.find(_._1 == queryId).get._2
    val q1 = start()
    try { input.addData(Seq((777777L, v))); q1.processAllAvailable() } finally q1.stop()
    // restart on the SAME checkpoint: the start-time layout guard must
    // accept its own layout back (base footer schema vs plan schema —
    // the encoder/parquet nullability difference must not refuse a
    // legitimate resume), the checkpoint identity must match, and the
    // resumed sink must append ONLY the new batch
    val q2 = start()
    try { input.addData(Seq((777778L, v.map(_ * 2f)))); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(genDir(dir) + "/streamed")
    assert(streamed.select(col("vec_id")).collect().map(_.getLong(0)).toSeq.sorted
      == Seq(777777L, 777778L), "exactly-once: one row per appended id, none dropped")
    // and the probe serves base + both resumed appends (same direction ⇒
    // identical codes ⇒ both rank at the top, above every corpus row)
    val top = Similarity.probeIvfIndexQuantized(
      spark, dir, "vec_id", v, centroids, k, nProbe = 8, excludeId = Some(queryId))
      .collect().map(_.getLong(0)).take(2).toSet
    assert(top == Set(777777L, 777778L), s"resumed appends must serve: $top")
  }

  test("PQ IVF ingest: typed appends visible, equal to a rebuild, folded by compaction") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-pqi").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-pqi-ck").toString
    Similarity.writeIvfIndexPq(emb, "vec_id", "embedding", centroids, pq, dir)
    val qVec = vecs.find(_._1 == queryId).get._2
    def probe(d: String): Seq[(Long, Double)] =
      Similarity.probeIvfIndexPq(
        spark, d, "vec_id", qVec, centroids, pq, k, nProbe = 8,
        excludeId = Some(queryId))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val s = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    s.addData(Seq((888888L, qVec)))
    val q = Similarity.ingestIvfIndexStreamPq(
      s.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      centroids, pq, dir, ckpt)
    try q.processAllAvailable() finally q.stop()
    val after = probe(dir)
    // the appended row carries the query's own codes, so ADC scores it at
    // the reconstruction's self-cosine — the maximum any row can reach
    assert(after.head._1 == 888888L, s"appended near-dup must rank first: $after")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-pqi2").toString
    Similarity.writeIvfIndexPq(
      emb.select(col("vec_id"), col("embedding"))
        .union(Seq((888888L, qVec)).toDF("vec_id", "embedding")),
      "vec_id", "embedding", centroids, pq, dir2)
    assert(probe(dir2) == after, "append == rebuild for the PQ layout")
    assert(Similarity.compactIndex(spark, dir, Seq("bucket")))
    assert(probe(dir) == after, "compaction must preserve probe answers")
    assert(!Similarity.compactIndex(spark, dir, Seq("bucket")),
      "second compaction must be a no-op (streamed/ was folded)")
  }

  test("PQ index: smaller than int8 on disk, pruned ADC probe, high top-k overlap") {
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    // m=16 (16 bytes/vector): the fixture embeddings are near-random —
    // neighbor cosines sit ~0.01 apart — so this is PQ's HARDEST regime;
    // 4-dim fragments keep the ADC rank within the int8 probe's k-2
    // posture even here, and the index still undercuts int8 by > 40%
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 16)
    val fDir = java.nio.file.Files.createTempDirectory("graft-ivf-pq-f").toString
    val qDir = java.nio.file.Files.createTempDirectory("graft-ivf-pq-q").toString
    val pDir = java.nio.file.Files.createTempDirectory("graft-ivf-pq-p").toString
    Similarity.writeIvfIndex(emb, "embedding", centroids, fDir)
    Similarity.writeIvfIndexQuantized(emb, "vec_id", "embedding", centroids, qDir)
    Similarity.writeIvfIndexPq(emb, "vec_id", "embedding", centroids, pq, pDir)
    def bytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(dir))
    }
    // the payload ladder holds on disk: PQ (m=16 bytes/vector) beats the
    // int8 index (dim=64 bytes + scale), which beats float
    assert(bytes(pDir) < bytes(qDir) * 0.6,
      s"pq ${bytes(pDir)} vs int8 ${bytes(qDir)}")
    assert(bytes(qDir) < bytes(fDir) * 0.6,
      s"int8 ${bytes(qDir)} vs float ${bytes(fDir)}")
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeIvfIndexPq(
      spark, pDir, "vec_id", qVec, centroids, pq, k, nProbe = 6,
      excludeId = Some(queryId))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    val approx = probed.collect().map(_.getLong(0)).toSet
    val exact = Similarity.probeIvfIndex(
      spark, fDir, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId)).collect().map(_.getLong(0)).toSet
    // k-3 (measured: exactly 7 — training is deterministic, so this is
    // a stable figure, not flake): one notch below the int8 probe's k-2
    // at 4× fewer payload bytes, on a fixture whose neighbor gaps
    // (~0.01 cosine) are the adversarial case for any reconstruction
    // rank. Clustered corpora — the regime IVF is FOR — sit well above
    // this floor.
    assert((approx & exact).size >= k - 3,
      s"overlap ${(approx & exact).size}/$k too low")
    // reserved index-column names refuse, same contract as the int8 writer
    intercept[IllegalArgumentException](Similarity.writeIvfIndexPq(
      emb.withColumn("codes", col("vec_id")), "vec_id", "embedding",
      centroids, pq, pDir, payloadCols = Seq("codes")))
  }

  test("residual PQ: tighter reconstructions beat raw PQ on clustered data") {
    import spark.implicits._
    // the regime residual coding is FOR: MORE clusters than codebook
    // entries (32 clusters, ksub=16), where raw PQ cannot even give each
    // cluster's fragment its own entry per subspace, while the residual
    // coder spends the whole budget on the cluster-INDEPENDENT noise
    // ball — the construction, not the budget, decides.
    val rnd = new scala.util.Random(7)
    val dim = 64
    val data = (0 until 32).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 20).map { i =>
        (c * 20L + i, center.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val q = data.find(_._1 == 0L).get._2
    val truth = data.filter(_._1 != 0L).map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    val centroids = Similarity.trainCentroids(df, "vec_id", "embedding", k = 32)
    val raw = Similarity.trainPq(df, "vec_id", "embedding", m = 8, ksub = 16)
    val res = Similarity.trainPqResidual(df, "vec_id", "embedding", centroids, m = 8, ksub = 16)
    val rawDir = java.nio.file.Files.createTempDirectory("graft-pq-raw").toString
    val resDir = java.nio.file.Files.createTempDirectory("graft-pq-res").toString
    Similarity.writeIvfIndexPq(df, "vec_id", "embedding", centroids, raw, rawDir)
    Similarity.writeIvfIndexPqResidual(df, "vec_id", "embedding", centroids, res, resDir)
    def recall(ids: Set[Long]): Double = truth.count(ids.contains).toDouble / k
    // score ERROR is the honest measurement here: the true within-cluster
    // ranking is noise-vs-noise (every member sits the same distance from
    // the center), so absolute rank recall is adversarial for ANY m-byte
    // coder — what residual coding buys is reconstruction accuracy, and
    // the rank quality follows it
    val trueCos = data.filterNot(_._1 == 0L)
      .map { case (id, v) => id -> cosine(v, q) }.toMap
    def meanErr(rows: Array[(Long, Double)]): Double =
      rows.map { case (id, s) => math.abs(s - trueCos(id)) }.sum / rows.length
    val rawRows = Similarity.probeIvfIndexPq(
      spark, rawDir, "vec_id", q, centroids, raw, 399, nProbe = 8, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val resProbed = Similarity.probeIvfIndexPqResidual(
      spark, resDir, "vec_id", q, centroids, res, 399, nProbe = 8, excludeId = Some(0L))
    val plan = resProbed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    val resRows = resProbed.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (rawErr, resErr) = (meanErr(rawRows), meanErr(resRows))
    assert(resErr < rawErr / 2,
      s"residual mean |adc-cos| $resErr must halve raw $rawErr on clustered data")
    // and the rank quality follows: top-k recall at the probe defaults
    val rawR = recall(rawRows.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet)
    val resR = recall(resRows.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet)
    assert(resR >= rawR, s"residual recall $resR must not trail raw $rawR")
    info(f"clustered: rawErr=$rawErr%.4f resErr=$resErr%.4f rawRecall=$rawR resRecall=$resR")
  }

  test("trainers survive poisoned sample vectors: non-finite rows neither train nor starve") {
    import spark.implicits._
    // a poisoned LOW-ID PREFIX is the adversarial shape: the sample is
    // first-N-by-id, so if the filter ran after the limit these rows
    // would consume the whole budget and return empty trainers — and if
    // they trained, ONE NaN point would turn every centroid NaN (NaN
    // ranks above any number in the assignment kernels)
    val dim = 8
    val rnd = new scala.util.Random(3)
    val poisoned = (0 until 6).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      v(i % dim) = if (i % 3 == 0) Float.NaN
        else if (i % 3 == 1) Float.PositiveInfinity else Float.NegativeInfinity
      (i.toLong, v)
    }
    val clean = (6 until 30).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = (poisoned ++ clean).toDF("vec_id", "embedding")
    // sampleSize = 6: a post-limit filter would see ONLY poisoned rows
    val cents = Similarity.trainCentroids(df, "vec_id", "embedding", k = 2, sampleSize = 6)
    assert(cents.nonEmpty && cents.forall(_.forall(java.lang.Float.isFinite)),
      "poisoned prefix must neither starve nor contaminate the centroids")
    val pq = Similarity.trainPq(df, "vec_id", "embedding", m = 2, ksub = 4, sampleSize = 6)
    assert(!pq.isEmpty && pq.books.forall(_.forall(_.forall(java.lang.Float.isFinite))),
      "PQ codebooks must be finite")
    val res = Similarity.trainPqResidual(
      df, "vec_id", "embedding", cents, m = 2, ksub = 4, sampleSize = 6)
    assert(!res.isEmpty && res.books.forall(_.forall(_.forall(java.lang.Float.isFinite))),
      "residual codebooks must be finite")
  }

  test("trainers survive RAGGED sample vectors: off-dimension rows neither train nor starve") {
    import spark.implicits._
    // the ragged sibling of the poisoned-prefix test: the executor
    // kernels NULL a mismatched row per row, but the trainers index
    // every sampled point up to pts.head.length — before the dim gate, a
    // length-2 row in the sample threw AIOOBE in kmeans, and a
    // one-short row silently ZERO-PADDED trainPq's tail subspace. The
    // adversarial shape is again a LOW-ID PREFIX: ragged rows dominate
    // the first ids, so a prefix-bounded dim probe would detect the
    // WRONG dim and a post-limit drop would starve the sample.
    val dim = 8
    val rnd = new scala.util.Random(7)
    val ragged = (0 until 6).map { i =>
      val len = Seq(2, dim - 1, dim + 3)(i % 3) // short, one-short, long
      (i.toLong, Array.fill(len)(rnd.nextGaussian().toFloat))
    }
    val clean = (6 until 30).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = (ragged ++ clean).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(df, "vec_id", "embedding", k = 2, sampleSize = 6)
    assert(cents.nonEmpty && cents.forall(_.length == dim),
      "ragged prefix must neither starve training nor skew the detected dimension")
    assert(cents.forall(_.forall(java.lang.Float.isFinite)))
    val pq = Similarity.trainPq(df, "vec_id", "embedding", m = 2, ksub = 4, sampleSize = 6)
    assert(!pq.isEmpty && pq.dsub == dim / 2,
      "PQ subspaces must split the modal dim, not a ragged head row's")
    val res = Similarity.trainPqResidual(
      df, "vec_id", "embedding", cents, m = 2, ksub = 4, sampleSize = 6)
    assert(!res.isEmpty && res.dsub == dim / 2)
    val hier = Similarity.trainCentroidsHier(
      df, "vec_id", "embedding", coarseCells = 2, finePerCell = 2, sampleSize = 6)
    assert(!hier.isEmpty && hier.coarse.forall(_.length == dim)
      && hier.fine.forall(_.length == dim))
  }

  test("residual ADC equals the driver reconstruction model; encode null contract") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val pq = Similarity.trainPqResidual(emb, "vec_id", "embedding", centroids, m = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-res-model").toString
    Similarity.writeIvfIndexPqResidual(emb, "vec_id", "embedding", centroids, pq, dir)
    val qVec = vecs.find(_._1 == queryId).get._2
    val got = Similarity.probeIvfIndexPqResidual(
      spark, dir, "vec_id", qVec, centroids, pq, k, nProbe = 8,
      excludeId = Some(queryId))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val qn = math.sqrt(qVec.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    val byId = vecs.toMap
    var maxErr = 0.0
    got.foreach { case (id, score) =>
      // encode through the kernel entry point, then replicate the ADC
      // table construction + kernel accumulation order in plain Scala:
      // q̂·cent first, per-subspace (dot, cross, norm²) partials in
      // dimension order, den = |cent|² + 2·cross + norm². Bit-for-bit.
      val row = graft.functions.VectorKernels.pqEncodeResidual(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          byId(id).map(_.asInstanceOf[Any])),
        centroids, pq.books, qVec.length, pq.dsub)
      val cent = centroids(row.getInt(0))
      val codes = row.getBinary(1)
      var qc = 0.0
      var cn = 0.0
      for (i <- qVec.indices) {
        qc += qVec(i).toDouble / qn * cent(i)
        cn += cent(i).toDouble * cent(i)
      }
      var dot = qc
      var cross = 0.0
      var n2 = 0.0
      for (s <- 0 until pq.m) {
        val e = pq.books(s)(codes(s) & 0xFF)
        var d = 0.0; var x = 0.0; var nn = 0.0
        for (j <- e.indices) {
          d += qVec(s * pq.dsub + j).toDouble / qn * e(j)
          nn += e(j).toDouble * e(j)
          x += cent(s * pq.dsub + j).toDouble * e(j)
        }
        dot += d; n2 += nn; cross += x
      }
      val model = dot / math.sqrt(cn + 2.0 * cross + n2)
      assert(model == score, s"id=$id driver ADC model diverged: $model vs $score")
      maxErr = math.max(maxErr, math.abs(score - cosine(byId(id), qVec)))
    }
    // near-random fixture: residual ≈ raw regime, the loose quality floor
    assert(maxErr < 0.2, s"max |adc - cosine| = $maxErr")
    // NULL contract: zero-norm and ragged vectors encode to a NULL struct
    val enc = Seq((1L, Array.fill(64)(0f)), (2L, qVec.take(5)))
      .toDF("id", "vec")
      .select(col("id"),
        graft.functions.native.pqEncodeResidual(col("vec"), centroids, pq.books).as("e"))
      .collect()
    assert(enc.forall(_.isNullAt(1)), "zero-norm/ragged must encode NULL")
    // FLAVOR guard: raw-PQ and residual-PQ share a schema, so the
    // generation's flavor marker is what refuses the cross-flavor
    // probe and ingester — plausible-looking garbage scores otherwise
    val crossProbe = intercept[IllegalArgumentException] {
      Similarity.probeIvfIndexPq(
        spark, dir, "vec_id", qVec, centroids, pq, k, nProbe = 2)
    }
    assert(crossProbe.getMessage.contains("flavor"), crossProbe.getMessage)
    val ck = java.nio.file.Files.createTempDirectory("graft-pq-flavor-ck").toString
    val stray = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val crossIngest = intercept[IllegalArgumentException] {
      Similarity.ingestIvfIndexStreamPq(
        stray.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        centroids, pq, dir, ck)
    }
    assert(crossIngest.getMessage.contains("flavor"), crossIngest.getMessage)
    // ...and compaction carries the marker: after folding a legitimate
    // residual append, the cross-flavor probe is STILL refused
    val rck = java.nio.file.Files.createTempDirectory("graft-pq-res-ck").toString
    val in2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    in2.addData(Seq((888888L, qVec)))
    val rq = Similarity.ingestIvfIndexStreamPqResidual(
      in2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      centroids, pq, dir, rck)
    try rq.processAllAvailable() finally rq.stop()
    assert(Similarity.compactIndex(spark, dir, Seq("bucket")))
    intercept[IllegalArgumentException] {
      Similarity.probeIvfIndexPq(
        spark, dir, "vec_id", qVec, centroids, pq, k, nProbe = 2)
    }
  }

  test("PQ ADC scores equal the driver reconstruction model; error band vs true cosine") {
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 8)
    // determinism: re-training on the same fixture reproduces the tensor
    val pq2 = Similarity.trainPq(emb, "vec_id", "embedding", m = 8)
    assert(pq.books.flatten.flatten.toSeq == pq2.books.flatten.flatten.toSeq)
    val pDir = java.nio.file.Files.createTempDirectory("graft-pq-model").toString
    Similarity.writeIvfIndexPq(emb, "vec_id", "embedding", centroids, pq, pDir)
    val qVec = vecs.find(_._1 == queryId).get._2
    val got = Similarity.probeIvfIndexPq(
      spark, pDir, "vec_id", qVec, centroids, pq, k, nProbe = 8,
      excludeId = Some(queryId))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // independent driver model: encode through the kernel entry point
    // (the same one the executors compile against), then replicate the
    // ADC table construction in plain Scala — per-(subspace, code)
    // partials in dimension order, summed in subspace order. Scores
    // must agree BIT-FOR-BIT: same doubles, same order.
    val qn = math.sqrt(qVec.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    def adc(codes: Array[Byte]): Double = {
      var dot = 0.0; var n2 = 0.0
      for (s <- codes.indices) {
        val book = pq.books(s)(codes(s) & 0xFF)
        var d = 0.0; var n = 0.0
        for (j <- book.indices) {
          d += qVec(s * pq.dsub + j).toDouble / qn * book(j)
          n += book(j).toDouble * book(j)
        }
        dot += d; n2 += n
      }
      dot / math.sqrt(n2)
    }
    val byId = vecs.toMap
    var maxErr = 0.0
    got.foreach { case (id, score) =>
      val codes = graft.functions.VectorKernels.pqEncode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          byId(id).map(_.asInstanceOf[Any])),
        pq.books, qVec.length, pq.dsub)
      assert(adc(codes) == score, s"id=$id driver ADC model diverged")
      maxErr = math.max(maxErr, math.abs(score - cosine(byId(id), qVec)))
    }
    // the reconstruction cosine tracks the true cosine within the
    // codebook error band on the fixture — the quality floor that makes
    // the ADC rank usable
    assert(maxErr < 0.15, s"max |adc - cosine| = $maxErr")
  }

  test("PQ encode: scale invariance, null contract, ladder byte width") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 8)
    assert(pq.m == 8 && pq.dsub == 8 && pq.ksub <= 256)
    val v = vecs.find(_._1 == queryId).get._2
    val frame = Seq(
      (1L, v),                      // encodes
      (2L, v.map(_ * 2f)),          // same DIRECTION: identical codes
      (3L, Array.fill(64)(0f)),     // zero norm: NULL
      (4L, v.take(10))              // ragged: NULL
    ).toDF("id", "vec")
    val enc = frame
      .select(col("id"), graft.functions.native.pqEncode(col("vec"), pq.books).as("codes"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])))
      .toMap
    assert(enc(1L).get.length == 8, "m bytes per vector")
    assert(enc(1L).get.toSeq == enc(2L).get.toSeq,
      "cosine is scale-invariant, so encode must be")
    assert(enc(3L).isEmpty && enc(4L).isEmpty, "zero-norm and ragged vectors carry NULL codes")
    // a ragged hand-built tensor would corrupt the ADC tables' block
    // arithmetic (ksub comes from books.head) — the constructor refuses
    intercept[IllegalArgumentException](Similarity.PqCodebooks(
      Array(Array(Array(1f, 2f)), Array(Array(1f, 2f), Array(3f, 4f)))))
    intercept[IllegalArgumentException](Similarity.PqCodebooks(
      Array(Array(Array.empty[Float]))))
  }

  test("streamed IVF ingestion: probes see appended vectors, pruning intact") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-stream-ck").toString
    // base index from the first half of the corpus…
    val half = vecs.length / 2
    val (baseVecs, lateVecs) = vecs.sortBy(_._1).splitAt(half)
    Similarity.writeIvfIndex(
      baseVecs.toSeq.toDF("vec_id", "embedding"), "embedding", centroids, path)
    // …the second half ARRIVES over two streamed batches
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt)
    try {
      val (b1, b2) = lateVecs.splitAt(lateVecs.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeIvfIndex(
      spark, path, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId))
    // both index roots are scanned bucket-pruned
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // and the result equals the in-memory search over the FULL corpus
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Similarity
      .ivfTopK(emb, "vec_id", "embedding", queryId, k, nCentroids = 8, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == mem, s"streamed-index probe diverged: $got vs $mem")
  }

  test("compactIndex folds streamed appends into the next generation: same answers, grace kept, partials swept") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-compact-ck").toString
    val (baseVecs, lateVecs) = vecs.sortBy(_._1).splitAt(vecs.length / 2)
    Similarity.writeIvfIndex(
      baseVecs.toSeq.toDF("vec_id", "embedding"), "embedding", centroids, path)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt)
    try {
      // several small batches -> several small files per touched bucket
      lateVecs.grouped(math.max(1, lateVecs.length / 4)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val qVec = vecs.find(_._1 == queryId).get._2
    def probe() = Similarity.probeIvfIndex(
      spark, path, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId)).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = probe()
    val gen1 = genDir(path)
    assert(new java.io.File(s"$gen1/streamed").exists())
    assert(Similarity.compactIndex(spark, path, Seq("bucket")))
    val gen2 = genDir(path)
    assert(gen2 != gen1, "compaction must flip to a new generation")
    assert(!new java.io.File(s"$gen2/streamed").exists(), "streamed must fold away")
    // the previous generation is KEPT as the grace copy for in-flight
    // probes (swept at the NEXT compaction) — no unavailability window
    assert(new java.io.File(gen1).exists(), "grace generation must survive the flip")
    assert(probe() == before, "compaction must never change answers")
    // idempotent: nothing left to compact
    assert(!Similarity.compactIndex(spark, path, Seq("bucket")))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // one more arrival — the ANTI-query vector (cosine −1), so top-k
    // answers stay comparable to `before` after it folds in. The
    // post-compaction ingest is a NEW GENERATION: fresh checkpoint
    // (the old one's sink log died with the folded streamed/ — see
    // compactIndex's contract)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ivf-compact-ck2").toString
    val input2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark) // new source position too
    input2.addData(Seq((999999L, qVec.map(-_))))
    val q2 = Similarity.ingestIvfIndexStream(
      input2.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    // a crashed rebuild's partial generation (no _GEN_DONE): probes never
    // resolve it, and the next compaction sweeps it before proceeding
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/gen-9/base/bucket=0"))
    assert(genDir(path) == gen2, "an uncommitted partial must not win resolution")
    assert(probe() == before, "a partial generation must not disturb probes")
    assert(Similarity.compactIndex(spark, path, Seq("bucket")))
    assert(!new java.io.File(s"$path/gen-9").exists(), "partials must be swept")
    assert(!new java.io.File(gen1).exists(), "the old grace generation must be swept")
    assert(probe() == before, "compaction after a crash must still be duplicate-free")
    // the NO-OP path (nothing streamed) retires crashed partials too —
    // a failed compaction's gigabytes must not leak on an index that
    // never sees another real compaction — while the committed grace
    // generation stays for in-flight probes
    val liveGen = genDir(path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/gen-20/base/bucket=0"))
    assert(!Similarity.compactIndex(spark, path, Seq("bucket")), "nothing to compact")
    assert(!new java.io.File(s"$path/gen-20").exists(),
      "the no-op path must retire done-less partials")
    assert(genDir(path) == liveGen && probe() == before)
  }

  test("producer lock: a live ingester blocks compaction/rebuild, stop() releases synchronously, resume-across-compaction is refused") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-lock").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivf-lock-ck").toString
    val (baseVecs, lateVecs) = vecs.sortBy(_._1).splitAt(vecs.length / 2)
    Similarity.writeIvfIndex(
      baseVecs.toSeq.toDF("vec_id", "embedding"), "embedding", centroids, path)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt)
    try {
      input.addData(lateVecs.toSeq); q.processAllAvailable()
      // while the ingester lives, every other producer fails fast at the
      // lock instead of flipping the generation under its appends
      val e = intercept[IllegalStateException](
        Similarity.compactIndex(spark, path, Seq("bucket")))
      assert(e.getMessage.contains("_GEN_LOCK"), e.getMessage)
      assert(e.getMessage.contains("ingestIvfIndexStream"),
        "the holder tag must name the live ingester")
      intercept[IllegalStateException](Similarity.writeIvfIndex(
        baseVecs.toSeq.toDF("vec_id", "embedding"), "embedding", centroids, path))
      val ckptB = java.nio.file.Files.createTempDirectory("graft-ivf-lock-ckB").toString
      intercept[IllegalStateException](Similarity.ingestIvfIndexStream(
        input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckptB))
    } finally q.stop()
    // stop() releases SYNCHRONOUSLY (not via the async listener bus):
    // the operational stop-then-compact sequence works back-to-back
    assert(Similarity.compactIndex(spark, path, Seq("bucket")))
    // the pre-compaction checkpoint has committed batches but its sink
    // log died with the folded streamed/ — resuming it is refused at
    // stream start (compactIndex's documented recovery contract)...
    val e2 = intercept[IllegalStateException](Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt))
    assert(e2.getMessage.contains("FRESH checkpoint"), e2.getMessage)
    // ...and the refusal released the lock (nothing wedged): a fresh
    // checkpoint starts, ingests, and a plain same-checkpoint RESTART
    // (no compaction in between) is still a legitimate resume
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ivf-lock-ck2").toString
    val input2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q2 = Similarity.ingestIvfIndexStream(
      input2.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt2)
    try { input2.addData(Seq((777777L, vecs.head._2))); q2.processAllAvailable() }
    finally q2.stop()
    val q3 = Similarity.ingestIvfIndexStream(
      input2.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt2)
    try { input2.addData(Seq((777778L, vecs.head._2))); q3.processAllAvailable() }
    finally q3.stop()
    val ids = spark.read.parquet(s"${genDir(path)}/streamed")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(777777L, 777778L),
      s"the resumed ingest must append exactly the new rows, got $ids")
    // cross-checkpoint confusion: the live generation now carries ckpt2's
    // sink log, so the PRE-compaction checkpoint's batch ids are already
    // "recorded" — FileStreamSink would silently skip them. The identity
    // pairing refuses what a sink-log-existence check would wave through
    val e3 = intercept[IllegalStateException](Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt))
    assert(e3.getMessage.contains("does not belong"), e3.getMessage)
    // and a NEVER-used checkpoint against a generation that already has
    // another's appends is refused too (its from-zero batch counter would
    // collide with the existing sink log): compact first
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft-ivf-lock-ck3").toString
    val e4 = intercept[IllegalStateException](Similarity.ingestIvfIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt3))
    assert(e4.getMessage.contains("Compact the index first"), e4.getMessage)
    // both refusals released the lock: compaction proceeds, after which
    // the never-used checkpoint pairs with the clean generation
    assert(Similarity.compactIndex(spark, path, Seq("bucket")))
    val input3 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q4 = Similarity.ingestIvfIndexStream(
      input3.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt3)
    try { input3.addData(Seq((777779L, vecs.head._2))); q4.processAllAvailable() }
    finally q4.stop()
    val ids2 = spark.read.parquet(s"${genDir(path)}/streamed")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids2 == Set(777779L), s"post-compaction fresh pairing must ingest cleanly, got $ids2")
    // a generation CLAIMED by a pairing that never committed a batch
    // (mid-pairing crash, or an abandoned checkpoint) refuses a fresh
    // checkpoint — the claim may still be resumable — and the refusal
    // names the documented heal, after which the start proceeds
    assert(Similarity.compactIndex(spark, path, Seq("bucket"))) // clean gen, no id
    val orphanId = new java.io.File(s"${genDir(path)}/_INGEST_ID")
    java.nio.file.Files.writeString(orphanId.toPath, "crashed-pairing-claim")
    val ckpt4 = java.nio.file.Files.createTempDirectory("graft-ivf-lock-ck4").toString
    val input4 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val e5 = intercept[IllegalStateException](Similarity.ingestIvfIndexStream(
      input4.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt4))
    assert(e5.getMessage.contains("claimed by ingest id crashed-pairing-claim"), e5.getMessage)
    assert(orphanId.delete(), "heal: drop the never-committed claim")
    val q5 = Similarity.ingestIvfIndexStream(
      input4.toDF().toDF("vec_id", "embedding"), "embedding", centroids, path, ckpt4)
    try { input4.addData(Seq((777780L, vecs.head._2))); q5.processAllAvailable() }
    finally q5.stop()
    val ids3 = spark.read.parquet(s"${genDir(path)}/streamed")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids3 == Set(777780L), s"healed claim must pair and ingest cleanly, got $ids3")
  }

  test("persisted LSH index: probe is partition-pruned and equals the in-memory lshTopK") {
    val emb = Tables.embeddings(spark, sf001)
    val (bands, bits) = (24, 3) // the fixture-tuned q_sim_topk_lsh regime
    val path = java.nio.file.Files.createTempDirectory("graft-lsh-index").toString
    Similarity.writeLshIndex(emb, "embedding", path, bands, bits)
    // band-partitioned directories on disk, one sig sub-dir per bucket hit
    val bandDirs =
      new java.io.File(s"${genDir(path)}/base").listFiles()
        .filter(_.getName.startsWith("band="))
    assert(bandDirs.length == bands)
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeLshIndex(
      spark, path, "vec_id", "embedding", qVec, k, bands, bits,
      excludeId = Some(queryId))
    // the scan carries partition filters on (band, sig) — directory-level
    // pruning, not a post-scan filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band"), plan)
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Similarity
      .lshTopK(emb, "vec_id", "embedding", queryId, k, bands, bits)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == mem)
    // ... and the probe reads only the query's own (band, sig) leaves:
    // of the bands × 2^bits possible leaves, at most `bands` are scanned
    val scanned = probed.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .filter(_.contains("Scan parquet")).mkString
    val files: Int = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(files > 0 && files <= bands,
      s"probe scanned $files leaf partitions (want 1..$bands): $scanned")
  }

  test("streamed LSH ingestion: probes see appended vectors, pruning intact") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val (bands, bits) = (24, 3)
    val dim = vecs.head._2.length
    val path = java.nio.file.Files.createTempDirectory("graft-lsh-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lsh-stream-ck").toString
    val half = vecs.length / 2
    val (baseVecs, lateVecs) = vecs.sortBy(_._1).splitAt(half)
    Similarity.writeLshIndex(
      baseVecs.toSeq.toDF("vec_id", "embedding"), "embedding", path, bands, bits)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = Similarity.ingestLshIndexStream(
      input.toDF().toDF("vec_id", "embedding"), "embedding", dim, path, ckpt, bands, bits)
    try {
      input.addData(lateVecs.toSeq); q.processAllAvailable()
    } finally q.stop()
    val qVec = vecs.find(_._1 == queryId).get._2
    val probed = Similarity.probeLshIndex(
      spark, path, "vec_id", "embedding", qVec, k, bands, bits,
      excludeId = Some(queryId))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band"), plan)
    val got = probed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = Similarity
      .lshTopK(emb, "vec_id", "embedding", queryId, k, bands, bits)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == mem, s"streamed-index probe diverged: $got vs $mem")
  }

  test("filtered probes: predicate before re-rank (right k), pruning and pushdown intact") {
    val emb = Tables.embeddings(spark, sf001)
    // a filtered search: "top-k WHERE label <= 4" (pushable comparison)
    val pred = col("label") <= 4
    val qVec = vecs.find(_._1 == queryId).get._2
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // LSH: filtered probe of the FULL index == in-memory flavor over the
    // pre-filtered corpus (same seed/planes → identical candidates)
    val (bands, bits) = (24, 3)
    val lshDir = java.nio.file.Files.createTempDirectory("graft-lsh-filt").toString
    Similarity.writeLshIndex(emb, "embedding", lshDir, bands, bits)
    val lshProbed = Similarity.probeLshIndex(
      spark, lshDir, "vec_id", "embedding", qVec, k, bands, bits,
      excludeId = Some(queryId), predicate = Some(pred))
    val lshPlan = lshProbed.queryExecution.executedPlan.toString
    assert(lshPlan.contains("PartitionFilters") && lshPlan.contains("band"), lshPlan)
    // the payload predicate reaches the parquet scan, it is not post-hoc
    assert(lshPlan.contains("LessThanOrEqual(label,4)"), lshPlan)
    val lshMem = Similarity.lshTopK(
      emb.filter(pred || col("vec_id") === queryId),
      "vec_id", "embedding", queryId, k, bands, bits)
    assert(rows(lshProbed) == rows(lshMem))
    assert(rows(lshProbed).size == k, "k must count filter survivors")

    // IVF (float and quantized): filtered probe of the full index ==
    // unfiltered probe of an index built from the pre-filtered corpus
    // with the SAME centroids (identical routing)
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val fullF = java.nio.file.Files.createTempDirectory("graft-ivf-filt-a").toString
    val filtF = java.nio.file.Files.createTempDirectory("graft-ivf-filt-b").toString
    Similarity.writeIvfIndex(emb, "embedding", centroids, fullF)
    Similarity.writeIvfIndex(emb.filter(pred), "embedding", centroids, filtF)
    val ivfGot = Similarity.probeIvfIndex(
      spark, fullF, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId), predicate = Some(pred))
    val ivfWant = Similarity.probeIvfIndex(
      spark, filtF, "vec_id", "embedding", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId))
    assert(ivfGot.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(rows(ivfGot) == rows(ivfWant))

    val fullQ = java.nio.file.Files.createTempDirectory("graft-ivfq-filt-a").toString
    val filtQ = java.nio.file.Files.createTempDirectory("graft-ivfq-filt-b").toString
    // the filtered probe needs `label` in the index payload — opt in
    // (the default payload is the bare id/scale/codes/bucket shape)
    Similarity.writeIvfIndexQuantized(
      emb, "vec_id", "embedding", centroids, fullQ, payloadCols = Seq("label"))
    Similarity.writeIvfIndexQuantized(
      emb.filter(pred), "vec_id", "embedding", centroids, filtQ, payloadCols = Seq("label"))
    val qGot = Similarity.probeIvfIndexQuantized(
      spark, fullQ, "vec_id", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId), predicate = Some(pred))
    val qWant = Similarity.probeIvfIndexQuantized(
      spark, filtQ, "vec_id", qVec, centroids, k, nProbe = 6,
      excludeId = Some(queryId))
    assert(rows(qGot) == rows(qWant))

    // index-column names are reserved: a payload named 'codes' (or
    // 'scale'/'bucket') would collide with the index's own columns and
    // leave the written index unprobeable — the writer must refuse
    intercept[IllegalArgumentException](Similarity.writeIvfIndexQuantized(
      emb.withColumnRenamed("label", "codes"), "vec_id", "embedding",
      centroids, fullQ, payloadCols = Seq("codes")))
  }

  test("assignBuckets: NULL vectors get a NULL bucket; assignment is deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val rows = Similarity.assignBuckets(df, "embedding", centroids)
      .orderBy("vec_id").collect()
    assert(rows(0).getInt(rows(0).fieldIndex("bucket")) == 0)
    assert(rows(1).getInt(rows(1).fieldIndex("bucket")) == 1)
    assert(rows(2).isNullAt(rows(2).fieldIndex("bucket")))
  }

  test("nearestCentroid kernel at k=256 equals the stacked-column formulation, codegen'd") {
    import spark.implicits._
    // realistic IVF centroid count — the regime where k stacked cosine
    // columns risk codegen method limits and k array traversals
    val rnd = new scala.util.Random(7)
    val dim = 16
    val corpus = (0 until 500).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val centroids = Array.fill(256)(Array.fill(dim)(rnd.nextGaussian().toFloat))

    val kernel = Similarity.assignBuckets(corpus, "embedding", centroids)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap

    // the pre-kernel formulation: k separate cosineSim columns +
    // array_position(array_max) — the semantic reference
    val scores = array(centroids.toSeq.map { c =>
      graft.functions.native.cosineSim(col("embedding"), typedLit(c.toSeq))
    }: _*)
    val columnar = corpus
      .withColumn("bucket", (array_position(scores, array_max(scores)) - 1).cast("int"))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(kernel == columnar)

    // the assignment stays a single whole-stage-codegen projection (on a
    // parquet scan — a local Seq relation would collapse to
    // LocalTableScan and hide the projection)
    val plan = Similarity
      .assignBuckets(Tables.embeddings(spark, sf001), "embedding", centroids.map(_.padTo(64, 0f)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
  }

  test("nearestCentroids: descending order, element 0 = single assignment, edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val centroids = Array.fill(12)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val got = corpus.select(
        col("vec_id"),
        graft.functions.native.nearestCentroids(col("embedding"), centroids, 4).as("b"),
        graft.functions.native.nearestCentroid(col("embedding"), centroids).as("b0"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val raw = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    got.foreach { case (id, buckets, b0) =>
      assert(buckets.length == 4)
      assert(buckets.head == b0) // element 0 IS the single assignment
      // exact top-4 by cosine, descending, ties by index
      val expect = centroids.indices
        .map(c => (c, cos(raw(id), centroids(c))))
        .sortBy { case (c, s) => (-s, c) }.take(4).map(_._1)
      assert(buckets == expect, s"id=$id")
    }
    // n > k clamps; ragged vector → null; zero-norm centroid skipped
    val shorty = Seq((1L, Array.fill(8)(1f))).toDF("vec_id", "embedding")
    assert(shorty.select(
      graft.functions.native.nearestCentroids(col("embedding"), centroids, 4))
      .collect().head.isNullAt(0))
    val two = Seq((1L, Array.fill(dim)(1f))).toDF("vec_id", "embedding")
    val clamped = two.select(
      graft.functions.native.nearestCentroids(col("embedding"),
        Array(Array.fill(dim)(0f), Array.fill(dim)(2f)), 5)).collect().head.getSeq[Int](0)
    assert(clamped == Seq(1)) // zero-norm skipped, clamp to the 1 valid centroid
  }

  test("nearestCentroidsHier: probes=all equals the flat kernel bit-for-bit; fewer probes restrict to probed cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 16
    val corpus = (0 until 300).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    // a hand-built two-level table: 4 cells × 6 fine = 24 fine centroids
    val coarse = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val fine = Array.fill(24)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val fineCell = Array.tabulate(24)(_ / 6)
    // probes >= cells: the exact anchor — identical to the flat kernel
    // over the same fine table, including tie order (global-index scan)
    val both = corpus.select(
        col("vec_id"),
        graft.functions.native
          .nearestCentroidsHier(col("embedding"), coarse, fine, fineCell, probes = 4, n = 5)
          .as("hier"),
        graft.functions.native.nearestCentroids(col("embedding"), fine, 5).as("flat"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"vec_id=${r.getLong(0)}")
    }
    // fewer probes: results come only from probed cells, in the same
    // descending order the flat kernel would give those cells' members
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val raw = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val probed = corpus.select(
        col("vec_id"),
        graft.functions.native
          .nearestCentroidsHier(col("embedding"), coarse, fine, fineCell, probes = 2, n = 5)
          .as("hier"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    probed.foreach { case (id, got) =>
      val v = raw(id)
      val cells = coarse.indices
        .map(c => (c, cos(v, coarse(c)))).sortBy { case (c, s) => (-s, c) }
        .take(2).map(_._1).toSet
      val expect = fine.indices
        .filter(f => cells.contains(fineCell(f)))
        .map(f => (f, cos(v, fine(f))))
        .sortBy { case (f, s) => (-s, f) }.take(5).map(_._1)
      assert(got == expect, s"id=$id")
    }
    // null contract matches the flat kernel: ragged vector → NULL
    val shorty = Seq((1L, Array.fill(8)(1f))).toDF("vec_id", "embedding")
    assert(shorty.select(
      graft.functions.native
        .nearestCentroidsHier(col("embedding"), coarse, fine, fineCell, 2, 3))
      .collect().head.isNullAt(0))
    // and the assignment is one codegen projection over a parquet scan
    val plan = Tables.embeddings(spark, sf001).select(
        graft.functions.native.nearestCentroidsHier(
          col("embedding"),
          coarse.map(_.padTo(64, 0f)), fine.map(_.padTo(64, 0f)), fineCell, 2, 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
  }

  test("trainCentroidsHier: cell-major fine table, members cluster near their cell, flat-trainer cost model avoided") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    // 6 well-separated clusters of 40 points
    val data = (0 until 6).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian() * 4)
      (0 until 40).map { m =>
        (c * 40L + m, center.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val h = Similarity.trainCentroidsHier(
      df, "vec_id", "embedding", coarseCells = 3, finePerCell = 4, sampleSize = 240)
    assert(h.coarse.length == 3)
    assert(h.fine.nonEmpty && h.fine.length == h.fineCell.length)
    assert(h.fineCell.forall(c => c >= 0 && c < 3))
    // cell-major: fineCell is non-decreasing (global index order == cell order)
    assert(h.fineCell.sameElements(h.fineCell.sorted))
    // construction guarantees (the contracts the kernel's validation and
    // pass-1 rely on — NOT fixture geometry): every coarse and fine
    // centroid is selectable (nonzero norm, right dim — the trainer
    // filters both levels), no cell exceeds its finePerCell budget, and
    // the model is kernel-constructible
    assert(h.coarse.forall(c => c.length == dim && c.exists(_ != 0f)))
    assert(h.fine.forall(f => f.length == dim && f.exists(_ != 0f)))
    assert(h.fineCell.groupBy(identity).values.forall(_.length <= 4))
    graft.functions.NearestCentroidsHier(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")),
      h.coarse.toSeq.map(_.toSeq), h.fine.toSeq.map(_.toSeq), h.fineCell.toSeq, 1, 1)
    // filing regression tripwire (deterministic fixture, seed 23, ×4
    // cluster separation gives the margin): each fine centroid lies
    // nearest its OWN coarse cell here. Not a construction guarantee in
    // general geometry — but on this fixture a miss means the trainer
    // misfiled members (argmaxDot tie-break or cell re-assignment
    // regression), which would silently cost probe recall.
    def cosd(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    h.fine.zip(h.fineCell).foreach { case (f, c) =>
      val best = h.coarse.indices.maxBy(i => cosd(f, h.coarse(i)))
      assert(best == c, s"fine centroid filed under cell $c but nearest to $best")
    }
  }

  test("hier-built IVF index: probes-all equals the flat build, probeIvfIndex prunes it unchanged") {
    val emb = Tables.embeddings(spark, sf001)
    val model = Similarity.trainCentroidsHier(
      emb, "vec_id", "embedding", coarseCells = 4, finePerCell = 2)
    val qVec = vecs.find(_._1 == queryId).get._2
    // probes >= cells: the hier build IS the flat build over model.fine
    val flatDir = java.nio.file.Files.createTempDirectory("graft-ivf-hflat").toString
    val hierDir = java.nio.file.Files.createTempDirectory("graft-ivf-hier").toString
    Similarity.writeIvfIndex(emb, "embedding", model.fine, flatDir)
    Similarity.writeIvfIndexHier(emb, "embedding", model, hierDir,
      probes = model.coarse.length)
    def probe(dir: String) = Similarity.probeIvfIndex(
      spark, dir, "vec_id", "embedding", qVec, model.fine, k, nProbe = 3,
      excludeId = Some(queryId))
    val flatGot = probe(flatDir).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val hierGot = probe(hierDir).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hierGot == flatGot, "probes-all hier build must equal the flat build")
    // the probe stays partition-pruned on the hier-built layout
    val plan = probe(hierDir).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // the approximation (probes=2 of 4 cells): same layout id space,
    // high top-k overlap with the exact flat build on the fixture
    val hier2Dir = java.nio.file.Files.createTempDirectory("graft-ivf-hier2").toString
    Similarity.writeIvfIndexHier(emb, "embedding", model, hier2Dir, probes = 2)
    val approx = probe(hier2Dir).collect().map(_.getLong(0)).toSet
    val exact = flatGot.map(_._1).toSet
    assert((approx & exact).size >= k - 2,
      s"overlap ${(approx & exact).size}/$k too low for the probes=2 build")
  }

  test("hyperplane signatures are deterministic across evaluations") {
    val emb = Tables.embeddings(spark, sf001)
    val sig = Similarity.hyperplaneSignature(col("embedding"), bits = 12, dim = 64)
    val a = emb.select(col("vec_id"), sig.as("s")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = emb.select(col("vec_id"), sig.as("s")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("labelCentroids equals the driver-side exact mean, dims in order") {
    val emb = Tables.embeddings(spark, sf001)
    val got = Similarity.labelCentroids(emb, "label", "embedding")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    // model: exact BigDecimal(scale 9) accumulation of the double view
    val rows = emb.select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val expect = rows.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> (0 until dim).map { d =>
        val sum = vs.map { case (_, v) =>
          BigDecimal(v(d).toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        sum.toDouble / vs.length
      }.toSeq
    }
    assert(got.keySet == expect.keySet)
    for (l <- got.keySet) assert(got(l) == expect(l), s"label $l")
  }

  test("labelCentroids divides by the NON-NULL value count; string labels classify (r20)") {
    import spark.implicits._
    // dim-1 of label "a": values 1.0 and NULL — the mean must be 1.0
    // (over present values), not 0.5 (count-all denominator)
    val emb = Seq(
      ("a", Seq(Some(1.0f), None)),
      ("a", Seq(Some(1.0f), Some(2.0f))),
      ("b", Seq(Some(3.0f), Some(4.0f)))).toDF("label", "embedding")
    val cents = Similarity.labelCentroids(emb, "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(cents("a") == Seq(1.0, 2.0), s"null element skewed the mean: ${cents("a")}")
    assert(cents("b") == Seq(3.0, 4.0))
    // classifyByCentroid no longer unboxes labels through getInt: a
    // STRING-labeled corpus classifies (labels echo as themselves here —
    // each class mean is nearest to its own members)
    val dense = Seq(
      ("x", Seq(1.0f, 0.0f)), ("x", Seq(0.9f, 0.1f)),
      ("y", Seq(0.0f, 1.0f)), ("y", Seq(0.1f, 0.9f))).toDF("label", "embedding")
    val conf = Similarity.classifyByCentroid(dense, "label", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(conf == Seq(("x", "x", 2L), ("y", "y", 2L)), conf.toString)
  }

  test("labelCentroids is partitioning-independent (exact, order-free accumulation)") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Similarity.labelCentroids(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.labelCentroids(emb.repartition(13), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("quantizeInt8: codes bounded, round-trip error within half a step, zero vector NULL") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(0.5f, -0.25f, 0.125f)),
      (1L, Array(-1.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)), // zero vector: no scale
      (3L, Array(0.5f, Float.NaN)),  // NaN scale: codes NULL, not garbage
      (4L, Array(0.5f, Float.PositiveInfinity)) // Inf scale: NULL too —
      // Inf/Inf=NaN would otherwise hit BigDecimal.valueOf and throw
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(rows, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getSeq[Int](2)))
      .sortBy(_._1)
    assert(got(0)._2 == 0.5 && got(0)._3 == Seq(127, -64, 32))
    assert(got(1)._3 == Seq(-127, 127, 0))
    assert(got(2)._3 == null)
    // the kernel's documented NaN/Inf contract: degenerate scales
    // yield NULL codes — where the old HOF formulation would have
    // thrown on the ANSI int cast (or, for Inf, inside BigDecimal)
    assert(got(3)._2.isNaN && got(3)._3 == null)
    assert(got(4)._2.isPosInfinity && got(4)._3 == null)
    // fixture round-trip: |v - code*scale/127| <= scale/254 (+ ulp slack)
    val fx = Similarity.quantizeInt8(Tables.embeddings(spark, sf001), "vec_id", "embedding")
      .join(Tables.embeddings(spark, sf001), "vec_id")
      .collect()
    fx.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      val vec = r.getSeq[Float](3)
      codes.zip(vec).foreach { case (c, v) =>
        assert(math.abs(c) <= 127)
        assert(math.abs(v.toDouble - c * scale / 127.0) <= scale / 254.0 + 1e-12)
      }
    }
  }

  test("quantizeInt8 equals the driver-side model on seeded random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 50L).map { i =>
      (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f))
    }
    val got = Similarity.quantizeInt8(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2).toList))
      .sortBy(_._1).toList
    val model = rows.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      val codes = v.map(x =>
        BigDecimal(x.toDouble / scale * 127)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt).toList
      (id, scale, codes)
    }.sortBy(_._1).toList
    assert(got == model)
  }

  test("search over the int8-quantized store recovers the exact top-k (high overlap)") {
    // the point of quantizeInt8: a 4x-smaller store that still answers
    // similarity queries — dequantize (code*scale/127) and brute-force
    // top-k, then compare against the exact-float top-k
    val deq = Similarity.quantizeInt8(Tables.embeddings(spark, sf001), "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Int](2).map(c => (c * r.getDouble(1) / 127.0).toFloat).toArray))
    val q = deq.find(_._1 == queryId).get._2
    val approx = deq
      .filter(_._1 != queryId)
      .map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1).toSet
    val exact = expected.map(_._1).toSet
    val overlap = (approx & exact).size
    assert(overlap >= k - 2, s"quantized search overlap $overlap/$k too low")
  }

  test("classifyByCentroid: separable clusters classify to their own label") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1), (3L, Array(0.1f, 0.9f, 0.0f), 1),
      (4L, Array(0.0f, 0.1f, 1.0f), 2), (5L, Array(0.0f, 0.0f, 0.9f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.classifyByCentroid(rows, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 0, 2L), (1, 1, 2L), (2, 2, 2L)))
  }

  test("classifyByCentroid equals the driver-side argmax over labelCentroids") {
    val emb = Tables.embeddings(spark, sf001)
    val cents = Similarity.labelCentroids(emb, "label", "embedding")
      .orderBy(org.apache.spark.sql.functions.col("label"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).map(_.toFloat).toArray))
    val data = emb.select("embedding", "label").collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
    def cosF(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // first-wins strictly-greater argmax over the label-ascending table —
    // the kernel's tie rule
    val model = data
      .map { case (v, lab) =>
        var best = cents.head._1
        var bestSim = cosF(v, cents.head._2)
        for ((cl, cv) <- cents.tail) {
          val s = cosF(v, cv)
          if (java.lang.Double.compare(s, bestSim) > 0) { best = cl; bestSim = s }
        }
        (lab, best)
      }
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((l, p), c) => (l, p, c) }.sorted
    val got = Similarity.classifyByCentroid(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == model)
    // confusion counts cover the whole corpus
    assert(got.map(_._3).sum == data.length.toLong)
  }

  test("bruteForceTopKBatch equals per-query bruteForceTopK, no corpus-sized exchange") {
    val emb = Tables.embeddings(spark, sf001)
    val qids = Seq(0L, 1L, 2L)
    val batch = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding", qids, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    qids.foreach { qid =>
      val single = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qid, k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.filter(_._1 == qid).toSeq == single, s"query $qid diverges")
    }
    // each branch is a TakeOrdered heap; the only sort after the union
    // sees queries×k rows (the determinism orderBy), never the corpus
    val p = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding", qids, k = 5)
      .queryExecution.executedPlan.toString
    assert(p.split("TakeOrderedAndProject").length - 1 >= qids.size, p)
    intercept[IllegalArgumentException](
      Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding", Seq.empty, 5))
    intercept[IllegalArgumentException](
      Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding", Seq(1L, 1L), 5))
  }
}
