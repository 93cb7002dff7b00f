package graft

import graft.ops.Search

class SearchSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side BM25 model in the operator's exact arithmetic order. */
  private def model(
      docs: Seq[(Long, String)],
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val dl = toks.map { case (id, ts) => id -> ts.size.toDouble }
    val n = docs.size.toDouble
    val avgdl = dl.values.sum / n
    val tf = terms.map(t => t -> toks.map { case (id, ts) => id -> ts.count(_ == t).toDouble }).toMap
    val df = terms.map(t => t -> tf(t).values.count(_ > 0).toDouble).toMap
    docs
      .map { case (id, _) =>
        val score = terms
          .map { t =>
            val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            idf * tf(t)(id) * (k1 + 1.0) / (tf(t)(id) + k1 * (1.0 - b + b * dl(id) / avgdl))
          }
          .reduceLeft(_ + _)
        (id, score)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
  }

  test("bm25TopK matches the driver-side model, ranks heavy term hits first") {
    val docs = Seq(
      (1L, "spark window merge spark"),
      (2L, "window window window table scan"),
      (3L, "merge"),
      (4L, "nothing relevant here at all whatsoever today"),
      (5L, "spark table scan row agg window batch")
    )
    val terms = Seq("spark", "window", "merge")
    val got = Search.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = model(docs, terms, 5)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) <= 1e-12, s"score drift: $g vs $w")
    }
    // the all-terms doc outranks everything; the no-term doc scores 0 and ranks last
    assert(got.head._1 == 1L)
    assert(got.last._1 == 4L && got.last._2 == 0.0)
  }

  test("bm25TopK k caps the result and ties break by ascending id") {
    val docs = Seq(
      (7L, "alpha beta"), (3L, "alpha beta"), (5L, "alpha beta"),
      (9L, "gamma delta epsilon")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 5L)) // identical scores -> id order decides
  }

  test("indexed BM25 equals the scan path on the fixture and prunes to the terms' buckets") {
    val docs = Tables.documents(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    Search.writeBm25Index(docs, "doc_id", "text", dir, buckets = 64)
    val terms = Seq("spark", "window", "merge")
    val scan = Search.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probe = Search.bm25TopKIndexed(spark, dir, terms, k = 10, buckets = 64)
    val indexed = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed.map(_._1) == scan.map(_._1))
    indexed.zip(scan).foreach { case ((_, a), (_, s)) =>
      assert(math.abs(a - s) <= 1e-12, s"score drift: $a vs $s")
    }
    // partition pruning: the postings scan reads only the terms' buckets
    // and the term filter reaches the parquet reader
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"), plan)
    assert(plan.contains("PushedFilters: [In(term"), plan)
  }

  test("bm25TopK rejects empty, duplicate, and multi-token terms") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Search.bm25TopK(docs, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](Search.bm25TopK(docs, "doc_id", "text", Seq("a", "a")))
    intercept[IllegalArgumentException](Search.bm25TopK(docs, "doc_id", "text", Seq("a b")))
  }

  test("phraseTopK: consecutive-token matches only, overlaps count, rank (count desc, id)") {
    val docs = Seq(
      (1L, "new york new york city"), // two occurrences
      (2L, "york new"),               // reversed — no match
      (3L, "in new york today"),      // one occurrence
      (4L, ""),                       // empty doc
      (5L, "new  york")               // whitespace run collapses — matches
    ).toDF("doc_id", "text")
    val got = Search.phraseTopK(docs, "doc_id", "text", Seq("new", "york"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (3L, 1L), (5L, 1L)))
    // overlapping windows each count: "a a a" contains "a a" twice
    val over = Seq((1L, "a a a")).toDF("doc_id", "text")
    assert(Search.phraseTopK(over, "doc_id", "text", Seq("a", "a")).head().getLong(1) == 2L)
    // absent phrase → empty result, not zero-score padding
    assert(Search.phraseTopK(docs, "doc_id", "text", Seq("absent", "phrase")).isEmpty)
  }

  test("phraseTopK plans with no Exchange — per-row windows + TakeOrdered only") {
    val docs = Tables.documents(spark, sf001)
    val p = Search.phraseTopK(docs, "doc_id", "text", Seq("table", "hash"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("phraseTopK rejects empty and multi-token phrase words") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Search.phraseTopK(docs, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](Search.phraseTopK(docs, "doc_id", "text", Seq("a b")))
  }
}
