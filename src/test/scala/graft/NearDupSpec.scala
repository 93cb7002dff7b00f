package graft

import org.apache.spark.sql.functions._
import graft.ops.NearDup

class NearDupSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side exact cosine — the one oracle copy the embedding-dedup
    * suites share. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  /** Driver-side union-find keep-min ground truth for collapse suites. */
  private def survivors(ids: Seq[Long], edges: Set[(Long, Long)]): Set[Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.filter(i => find(i) == i).toSet
  }

  test("native expressions stay inside whole-stage codegen") {
    val plan = Tables.documents(spark, sf001)
      .select(
        NearDup.shingles(col("text")).as("sh"),
        graft.functions.native.cosineSim(
          array(lit(1.0f)), array(lit(2.0f))).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
  }

  test("shingles: distinct word 3-grams; short docs have none") {
    val got = Seq(
      "a b c d",          // 2 shingles
      "a b c a b c",      // duplicates collapse: "a b c","b c a","c a b" → 4 distinct
      "one two",          // < k words → none
      "   ",              // whitespace-only → none
      "x  y\tz"           // normalization: 1 shingle
    ).toDF("text").select(NearDup.shingles(col("text")).as("s")).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).toSet == Set("a b c", "b c a", "c a b", "b c a b") - "b c a b") // 3 distinct of 4 windows
    assert(got(1).size == 3)
    assert(got(2).isEmpty && got(3).isEmpty)
    assert(got(4) == Seq("x y z"))
  }

  private val corpus = Seq(
    // 0 and 1: identical after whitespace normalization
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick  brown fox jumps over the lazy dog again and again today"),
    // 2: one word changed vs 0 → high but < 1 jaccard
    (2L, "the quick brown fox leaps over the lazy dog again and again today"),
    // 3: unrelated
    (3L, "completely different content about spark catalyst optimizer internals"),
    // 4: shares one shingle with 0 but far below threshold
    (4L, "the quick brown cat sat still watching birds in the garden quietly")
  ).toDF("doc_id", "text")

  test("exactJaccardPairs finds the planted near-dups with exact scores") {
    val got = NearDup
      .exactJaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(got.keySet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(got((0L, 1L)) == 1.0)
    // 0 vs 2: 13 words → 11 shingles each; one word changed breaks 3
    // windows → |∩|=8, |∪|=14 → 4/7
    assert(math.abs(got((0L, 2L)) - 8.0 / 14) < 1e-12)
  }

  test("prefix filtering bounds boilerplate candidates and stays lossless") {
    // A corpus where EVERY doc shares a boilerplate opening — the
    // hot-shingle regime that made the raw inverted-index join O(m²).
    val boiler = "subscribe to our newsletter right now"
    val unique = (0 until 40).map(i =>
      (i.toLong, s"$boiler document $i talks about topic$i detail$i extra$i more$i"))
    val planted = Seq(
      (100L, s"$boiler the quick brown fox jumps over the lazy dog again and again"),
      (101L, s"$boiler the quick brown fox jumps over the lazy dog again and again"),
      (102L, s"$boiler the quick brown fox leaps over the lazy dog again and again"))
    val docs = (unique ++ planted).toDF("doc_id", "text")

    // the uncapped join meets every pair through the boilerplate shingles
    val sh = docs.select(col("doc_id").as("id"), explode(NearDup.shingles(col("text"), 3)).as("s"))
    val uncapped = sh.select(col("s"), col("id").as("id1"))
      .join(sh.select(col("s"), col("id").as("id2")), "s")
      .filter(col("id1") < col("id2")).select("id1", "id2").distinct().count()
    assert(uncapped == 43L * 42 / 2, "boilerplate makes every pair a raw candidate")

    // doc-freq order: hot shingles sort LAST, so the boilerplate bucket
    // collapses (the order to pick for boilerplate-heavy corpora)
    val prunedDf =
      NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8, "docfreq").count()
    assert(prunedDf < uncapped / 10,
      s"doc-freq prefix should collapse the boilerplate bucket: $prunedDf vs $uncapped")
    // hash order: hot shingles land in ~(1-t) of prefixes — candidates
    // shrink vs uncapped but by design less than doc-freq order does
    val prunedHash =
      NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8, "hash").count()
    assert(prunedHash < uncapped,
      s"hash prefix must still prune: $prunedHash vs $uncapped")
    assert(prunedDf <= prunedHash,
      "doc-freq order is the tighter candidate bound under boilerplate")

    // losslessness: results equal the naive full-join formulation (the
    // oracle's shape) at both thresholds, including exact scores —
    // under BOTH orders
    def naive(t: Double): Map[(Long, Long), Double] = {
      val W = org.apache.spark.sql.expressions.Window
      val shn = docs
        .select(col("doc_id").as("id"), explode(NearDup.shingles(col("text"), 3)).as("s"))
        .withColumn("n", count(lit(1)).over(W.partitionBy(col("id"))))
      shn.select(col("id").as("id1"), col("s"), col("n").as("n1"))
        .join(shn.select(col("id").as("id2"), col("s"), col("n").as("n2")), "s")
        .filter(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("c"), max(col("n1")).as("n1"), max(col("n2")).as("n2"))
        .select(col("id1"), col("id2"),
          (col("c") / (col("n1") + col("n2") - col("c"))).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    for (t <- Seq(0.8, 0.5); order <- Seq("hash", "docfreq")) {
      val got = NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, t, order)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == naive(t), s"prefix-filtered result diverged at t=$t order=$order")
    }
    // and the planted pairs are the ones found at 0.8
    val at08 = NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(at08.keySet == Set((100L, 101L)) && at08((100L, 101L)) == 1.0)
  }

  test("minhashNearDupPairs equals the exact pairs on the planted corpus") {
    val exact = NearDup.exactJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = NearDup.minhashNearDupPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == exact)
  }

  test("minhashNearDupPairs equals exactJaccardPairs on the fixture at threshold 0.8") {
    val docs = Tables.documents(spark, sf01)
    val exact = NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mh = NearDup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(mh == exact)
  }

  test("probeMinhashIndex equals the exact cross pairs; probe prunes partitions; append closes the loop") {
    val docs = Tables.documents(spark, sf01)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
    try {
      NearDup.writeMinhashIndex(history, "doc_id", "text", dir)
      val probe = NearDup.probeMinhashIndex(dir, history, batch, "doc_id", "text")
      val got = probe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // exact cross restriction of the full pair set
      val exact = NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .flatMap { case (a, b, j) =>
          if (a % 10 == 0 && b % 10 != 0) Some((a, b, j))
          else if (b % 10 == 0 && a % 10 != 0) Some((b, a, j))
          else None
        }.toSet
      assert(exact.nonEmpty, "fixture should contain cross-side near-dups")
      assert(got == exact)
      // the index read is partition-pruned to the batch's own parts
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("part"),
        s"probe must prune index partitions:\n${plan.take(2000)}")
      // incremental loop: append day-1's batch, probe day-2 against the
      // grown index == probe against a full rebuild
      val day1 = batch.filter(pmod(col("doc_id"), lit(20)) === 0)
      val day2 = batch.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      NearDup.writeMinhashIndex(history, "doc_id", "text", dir) // reset
      NearDup.appendMinhashIndex(day1, "doc_id", "text", dir)
      val grown = NearDup
        .probeMinhashIndex(dir, history.unionByName(day1), day2, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val rebuilt = java.nio.file.Files.createTempDirectory("graft-mh-idx2").toString
      NearDup.writeMinhashIndex(history.unionByName(day1), "doc_id", "text", rebuilt)
      val fromRebuild = NearDup
        .probeMinhashIndex(rebuilt, history.unionByName(day1), day2, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(grown == fromRebuild)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("probeMinhashIndex with an empty batch returns an empty frame, no index read") {
    val docs = Tables.documents(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-empty").toString
    NearDup.writeMinhashIndex(docs, "doc_id", "text", dir)
    val out = NearDup.probeMinhashIndex(
      dir, docs, docs.filter(lit(false)), "doc_id", "text")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("new_id", "old_id", "jaccard"))
  }

  test("minhash candidate volume is banded, not quadratic") {
    // 5 docs → at most C(5,2)=10 pairs; candidates must not exceed that,
    // and unrelated docs should not become candidates.
    val cands = NearDup.minhashCandidatePairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("collapseNearDups keeps one doc per component, transitively") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components: {0,1,2} via a CHAIN (0-1, 1-2 — no 0-2 pair: dropping
    // id2 of each pair would wrongly also keep nothing of 2's twin),
    // {5,7} a plain pair, a {3,4,8} triangle; 6 and 9 unpaired
    val pairs = Seq(
      (0L, 1L), (1L, 2L),
      (5L, 7L),
      (3L, 4L), (3L, 8L), (4L, 8L)
    ).toDF("id1", "id2")
    val got = NearDup.collapseNearDups(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 3L, 5L, 6L, 9L))
  }

  test("collapseNearDups with no pairs returns the corpus unchanged") {
    import spark.implicits._
    val docs = (0L to 3L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(NearDup.collapseNearDups(docs, "doc_id", none).count() == 4)
  }

  test("collapseNearDups converges on an adversarial chain (worst-case diameter)") {
    import spark.implicits._
    // ids placed ADVERSARIALLY: the path runs 1-2-…-30-0, so the
    // component minimum (0) sits at the FAR end and must propagate
    // diameter-many rounds to reach node 1. (A monotone chain 0-1-…-n is
    // no test at all: every node has a smaller immediate neighbor, so one
    // round already yields the right survivor set.)
    val docs = (0L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = ((1L until 30L).map(i => (i, i + 1)) :+ (30L, 0L)).toDF("id1", "id2")
    val got = NearDup.collapseNearDups(docs, "doc_id", chain)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L))
  }

  test("crossSourceMatrix canonicalizes source pairs and counts the diagonal") {
    import spark.implicits._
    val docs = Seq(
      (0L, "A"), (1L, "B"), (2L, "A"), (3L, "B"), (4L, "C")
    ).toDF("doc_id", "source")
    // pairs: 0-1 (A,B), 1-2 (A,B — reversed source order), 1-3 (B,B), 4 unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val got = NearDup.crossSourceMatrix(docs, "doc_id", "source", pairs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", "B", 2L), ("B", "B", 1L)))
  }

  test("nearDupClusters reports component sizes labeled by minimum id") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq(
      (0L, 1L), (1L, 2L),          // chain {0,1,2}
      (5L, 7L),                    // pair {5,7}
      (3L, 4L), (3L, 8L), (4L, 8L) // triangle {3,4,8}
    ).toDF("id1", "id2")
    val got = NearDup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3L), (3L, 3L), (5L, 2L)))
  }

  test("collapseNearDupsKeepBest keeps the highest-scoring member per component") {
    import spark.implicits._
    // same component structure as the min-id test, plus a score column:
    // {0,1,2} chain — best is 1 (score 50); {5,7} — tie at 10 keeps the
    // LOWER id 5; {3,4,8} triangle — best is 8; 6 and 9 unpaired survive
    val docs = Seq(
      (0L, 20L), (1L, 50L), (2L, 30L),
      (3L, 5L), (4L, 7L), (8L, 9L),
      (5L, 10L), (7L, 10L),
      (6L, 1L), (9L, 2L)
    ).toDF("doc_id", "score")
    val pairs = Seq(
      (0L, 1L), (1L, 2L),
      (5L, 7L),
      (3L, 4L), (3L, 8L), (4L, 8L)
    ).toDF("id1", "id2")
    val got = NearDup.collapseNearDupsKeepBest(docs, "doc_id", pairs, "score")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L, 6L, 8L, 9L))
  }

  test("collapseNearDupsKeepBest degenerates to collapseNearDups under a constant score") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, 0L)).toDF("doc_id", "score")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L), (3L, 4L), (3L, 8L), (4L, 8L))
      .toDF("id1", "id2")
    val best = NearDup.collapseNearDupsKeepBest(docs, "doc_id", pairs, "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val minId = NearDup.collapseNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == minId)
  }

  test("collapseNearDups refuses to return under-merged components at maxIter") {
    import spark.implicits._
    // truncating the propagation silently would RETAIN near-duplicates;
    // the operator must fail loudly instead
    val docs = (0L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = ((1L until 30L).map(i => (i, i + 1)) :+ (30L, 0L)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      NearDup.collapseNearDups(docs, "doc_id", chain, maxIter = 5).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("simhash64: whitespace variants collide; token changes move few bits; unrelated docs are far") {
    val hs = corpus.select(col("doc_id"), NearDup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(dist(0L, 1L) == 0)
    assert(dist(0L, 2L) > 0 && dist(0L, 2L) < dist(0L, 3L))
  }

  test("simhashes (explode+aggregate) computes the same values as simhash64 (HOF)") {
    val viaAgg = NearDup.simhashes(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHof = corpus.select(col("doc_id"), NearDup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaHof)
  }

  test("simhash64 of empty/whitespace text is NULL") {
    val r = Seq("", "   ").toDF("text").select(NearDup.simhash64(col("text"))).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("simhashNearDupPairs blocks by 16-bit chunks and verifies Hamming") {
    val got = NearDup.simhashNearDupPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.map(p => (p._1, p._2)).contains((0L, 1L)))
    got.foreach { case (_, _, h) => assert(h <= 3) }
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(3L) })
  }

  test("winnowPairs detects copied passages, not just whole-doc dups") {
    val passage = "the shared passage of considerable length that was copied verbatim between documents"
    val docs = Seq(
      (1L, s"first document introduction $passage and its own conclusion here"),
      (2L, s"second document different framing $passage with other trailing words"),
      (3L, "entirely unrelated document about columnar storage and vectorized execution engines")
    ).toDF("doc_id", "text")
    val got = NearDup.winnowPairs(docs, "doc_id", "text", minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("containmentPairs is directional: the excerpt is inside the long doc, not vice versa") {
    val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray " +
      "yankee zulu one two three four five six seven eight nine ten eleven twelve"
    val excerpt = body.split(" ").slice(8, 24).mkString(" ") // interior passage
    val docs = Seq(
      (1L, s"wrapper header text $body wrapper footer text"), // long doc
      (2L, excerpt),                                          // excerpt ⊂ 1
      (3L, "entirely unrelated text about shuffle partitioning and codegen stages")
    ).toDF("doc_id", "text")
    val got = NearDup
      .containmentPairs(docs, "doc_id", "text", num = 4, den = 5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // 2-in-1 passes the 4/5 bar (boundary fingerprints only differ);
    // 1-in-2 must NOT (most of doc 1 is not in the excerpt)
    assert(got.keySet == Set((2L, 1L)))
    assert(got((2L, 1L)) >= 0.8 && got((2L, 1L)) <= 1.0)
    // near-identical docs contain each other — both directions emitted
    val dups = Seq((10L, body), (11L, body + " tail")).toDF("doc_id", "text")
    val both = NearDup.containmentPairs(dups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both == Set((10L, 11L), (11L, 10L)))
  }

  test("dropSubsumed removes excerpts and mutual-dup higher ids, keeps containers") {
    val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray " +
      "yankee zulu one two three four five six seven eight nine ten eleven twelve"
    val excerpt = body.split(" ").slice(8, 24).mkString(" ")
    // disjoint vocabulary from `body`, so the mutual pair relates only
    // to itself and not to the container/excerpt cluster
    val other = "grape melon peach plum apple cherry mango banana kiwi lychee papaya " +
      "guava fig date quince apricot nectarine persimmon pomelo tangerine citron " +
      "mulberry boysenberry cranberry gooseberry elderberry currant damson sloe medlar"
    val docs = Seq(
      (1L, s"wrapper header text $body wrapper footer text"), // container — kept
      (2L, excerpt),                                          // strict excerpt — dropped
      (3L, "entirely unrelated text about shuffle partitioning and codegen stages"), // kept
      (10L, other), (11L, other + " tail")                    // mutual pair — keep 10
    ).toDF("doc_id", "text")
    val kept = NearDup.dropSubsumed(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 10L))
  }

  test("empty corpus yields empty vector-near-dup/ANN results, not a crash") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(NearDup.embeddingNearDupPairs(empty, "vec_id", "embedding").count() == 0)
    assert(graft.ops.Similarity.lshTopK(empty, "vec_id", "embedding", 0L, 5).count() == 0)
  }

  test("native cosine of ragged (mismatched-length) vectors is NULL, not a truncated score") {
    val r = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(graft.functions.native.cosineSim(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("hyperplane signatures of a ragged vector are NULL, matching the cosine contract") {
    // dim=3 planes against a 2-element vector: must surface as NULL, not
    // out-of-bounds reads or garbage sign bits (ADVICE r3).
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f))
    ).toDF("vec_id", "embedding")
      .select(
        col("vec_id"),
        graft.functions.native
          .hyperplaneSignatures(col("embedding"), bands = 4, bits = 8, dim = 3)
          .as("sigs"))
      .orderBy("vec_id")
      .collect()
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[Long](1).size == 4)
    assert(rows(1).isNullAt(1))
  }

  test("detectDim skips NULLs and is MODAL: a ragged first row cannot pick the wrong dim") {
    val df = Seq(
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array(1.0f, 2.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.detectDim(df, "embedding") == 3)
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.detectDim(allNull, "embedding") == 0)
    // first-row detection would say 2 here and silently NULL the dim-3
    // majority's signatures (a near-empty LSH index); modal says 3
    val ragged = Seq(
      (1L, Array(9.0f, 9.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(4.0f, 5.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.detectDim(ragged, "embedding") == 3)
    // deterministic tie-break: equal counts go to the SMALLER dim
    val tied = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.detectDim(tied, "embedding") == 2)
  }

  test("semanticDedup equals unbucketed collapse (clustered: nAssign=1; fixture: declared params)") {
    // 1) SemDeDup's home regime: tight clusters, where nAssign=1 suffices
    //    because a duplicate pair is never split across k-means cells
    val rnd = new scala.util.Random(29)
    val dim = 32
    val data = (0 until 4).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        (c * 5L + m, center.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val truth = (for { (i, vi) <- data; (j, vj) <- data if i < j && cos(vi, vj) >= 0.9 }
      yield (i, j)).toSet
    assert(truth.nonEmpty) // the fixture really is a dup regime
    val expect = survivors(data.map(_._1), truth)
    val got = NearDup
      .semanticDedup(df, "vec_id", "embedding", threshold = 0.9,
        nClusters = 4, nAssign = 1, sampleSize = 20)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)

    // 2) the declared q_semdedup contract on the driver fixture:
    //    bucketed result == unbucketed brute-force collapse
    val emb = Tables.embeddings(spark, sf001)
    val vec = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val bruteP = vec.as("a").join(vec.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        graft.functions.native.cosineSim(col("a.v"), col("b.v")).as("cs"))
      .filter(col("cs") >= 0.5).select("id1", "id2")
    val brute = NearDup.collapseNearDups(emb, "vec_id", bruteP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sem = NearDup
      .semanticDedup(emb, "vec_id", "embedding", threshold = 0.5,
        nClusters = 8, nAssign = 4)
      .collect().map(_.getLong(0)).toSet
    assert(sem == brute)
  }

  test("semanticDedupHier equals the unbucketed collapse on both regimes (the flat operator's own contract)") {
    // 1) clustered regime — duplicates never straddle cells, so even
    //    coarseProbes=1 must find every pair
    val rnd = new scala.util.Random(31)
    val dim = 32
    val data = (0 until 4).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        (c * 5L + m, center.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val truth = (for { (i, vi) <- data; (j, vj) <- data if i < j && cos(vi, vj) >= 0.9 }
      yield (i, j)).toSet
    val expect = survivors(data.map(_._1), truth)
    val got = NearDup
      .semanticDedupHier(df, "vec_id", "embedding", threshold = 0.9,
        coarseCells = 2, finePerCell = 2, nAssign = 1, coarseProbes = 1, sampleSize = 20)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // 2) the driver fixture at the declared q_semdedup regime: hier
    //    buckets + exact verify == brute-force unbucketed collapse
    //    (probes=2 of 4 cells — the approximation, not the exact anchor,
    //    must already recover every pair here)
    val emb = Tables.embeddings(spark, sf001)
    val vec = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val bruteP = vec.as("a").join(vec.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        graft.functions.native.cosineSim(col("a.v"), col("b.v")).as("cs"))
      .filter(col("cs") >= 0.5).select("id1", "id2")
    val brute = NearDup.collapseNearDups(emb, "vec_id", bruteP)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sem = NearDup
      .semanticDedupHier(emb, "vec_id", "embedding", threshold = 0.5,
        coarseCells = 4, finePerCell = 2, nAssign = 4, coarseProbes = 2)
      .collect().map(_.getLong(0)).toSet
    assert(sem == brute)
  }

  test("embeddingNearDupPairs finds intra-cluster pairs with exact precision") {
    val rnd = new scala.util.Random(13)
    val dim = 32
    val data = (0 until 4).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        (c * 5L + m, center.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
      }
    }
    val df = data.toDF("vec_id", "embedding")
    val got = NearDup.embeddingNearDupPairs(df, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val truth = (for {
      (i, vi) <- data; (j, vj) <- data if i < j && cos(vi, vj) >= 0.9
    } yield (i, j)).toSet
    // precision exact (verify stage), recall high on the near-dup regime
    assert(got.keySet.subsetOf(truth))
    assert(got.size >= (truth.size * 0.9).toInt)
    // scores are true cosines
    got.foreach { case ((i, j), s) =>
      val e = cos(data.find(_._1 == i).get._2, data.find(_._1 == j).get._2)
      assert(math.abs(s - e) < 1e-9)
    }
    // the candidate-dedup placement flag is a pure plan choice — the
    // pair set and scores must be identical either way
    val pre = NearDup
      .embeddingNearDupPairs(df, "vec_id", "embedding", threshold = 0.9,
        dedupCandidates = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pre == got)
    // knownDim (the detect-once convention, r17): identical pairs and
    // scores with the detection aggregate skipped
    val known = NearDup
      .embeddingNearDupPairs(df, "vec_id", "embedding", threshold = 0.9,
        knownDim = dim)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(known == got)
  }

  test("cardinality-pruned verify equals the unconditional verify (r22 semi-join switch)") {
    // selective regime: few near-dup docs in a larger unique corpus, so
    // candidate ids cover well under half the docs and the switch FIRES
    val base = (0L until 60L).map(i => (i, s"alpha bravo charlie delta echo f$i g$i h$i i$i j$i k$i"))
    val dups = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "the quick brown fox jumps over the lazy dog again and again today"),
      (102L, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val docs = spark.createDataFrame(base ++ dups).toDF("doc_id", "text")
    val pruned =
      try {
        spark.conf.set("spark.graft.neardup.pruneVerify", "true")
        NearDup
          .minhashNearDupPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      } finally spark.conf.unset("spark.graft.neardup.pruneVerify")
    val unpruned = NearDup
      .jaccardVerify(
        NearDup.minhashCandidatePairs(docs, "doc_id", "text", 3, 16, 4),
        docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == unpruned)
    assert(pruned.nonEmpty)
    // clique regime (pruning keeps every doc — the prune passes all ids
    // through and the result is still the full pair set)
    val all = (0L until 20L).map(i => (i, "same words everywhere in this tiny corpus of clones"))
    val clones = spark.createDataFrame(all).toDF("doc_id", "text")
    val got =
      try {
        spark.conf.set("spark.graft.neardup.pruneVerify", "true")
        NearDup.exactJaccardPairs(clones, "doc_id", "text", 3, 0.8).count()
      } finally spark.conf.unset("spark.graft.neardup.pruneVerify")
    assert(got == 20L * 19 / 2)
    assert(NearDup.exactJaccardPairs(clones, "doc_id", "text", 3, 0.8).count() == got)
  }
}
