package graft

import graft.ops.TextOps

/** BPE merge learning against an independent driver-side reference
  * implementation (Sennrich-style: overlapping pair counts, greedy
  * left-to-right non-overlapping application, lexicographic
  * tie-break). */
class BpeTrainSpec extends SparkTestBase {

  import spark.implicits._

  /** Reference implementation over a word-frequency map. */
  private def model(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var state: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.toVector.map(_.toString), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continueLoop = true
    while (merges.size < n && continueLoop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) continueLoop = false
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        state = state.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += (best._1 + best._2); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
      }
    }
    merges.toSeq
  }

  test("learnBpeMerges equals the reference implementation (runs, ties, repeats)") {
    val docs = Seq(
      "low low low lower lowest",
      "new newer newest new new",
      "aaa aa ab")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val freq: Map[String, Long] = Seq(
      "low" -> 3L, "lower" -> 1L, "lowest" -> 1L,
      "new" -> 3L, "newer" -> 1L, "newest" -> 1L,
      "aaa" -> 1L, "aa" -> 1L, "ab" -> 1L).toMap
    val expect = model(freq, 8)
    val got = TextOps.learnBpeMerges(docs, "text", nMerges = 8)
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("applyBpeMerges encodes exactly as the reference model tokenizes") {
    val docs = Seq((0L, "low lower lowest low low")).toDF("doc_id", "text")
    val merges = TextOps.learnBpeMerges(docs, "text", nMerges = 4)
    // reference: tokenize each word by applying the merges in order
    def encode(w: String): Vector[String] = {
      var syms = w.toVector.map(_.toString)
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val got = docs
      .select(TextOps.applyBpeMerges(org.apache.spark.sql.functions.col("text"), merges))
      .collect()(0).getSeq[String](0).toVector
    val expect = "low lower lowest low low".split(" ").toVector.flatMap(encode)
    assert(got == expect, s"got=$got expect=$expect")
    // merges never cross the word boundary: token count ≥ word count
    assert(got.length >= 5)
  }

  test("learnBpeMerges caps nMerges with single-process-trainer guidance") {
    // each merge is a sequential Spark job — vocab-scale counts belong in
    // a local trainer over the exported word table (see Scaladoc/PLANS.md)
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextOps.learnBpeMerges(docs, "text", nMerges = TextOps.MaxBpeMerges + 1))
    assert(e.getMessage.contains("MaxBpeMerges"))
  }

  test("learnBpeMerges stops early when no pair remains") {
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text") // single-char words only
    assert(TextOps.learnBpeMerges(docs, "text", nMerges = 5).isEmpty)
  }

  test("learnBpeMerges is deterministic across runs") {
    val docs = Tables.documents(spark, sf001)
    val a = TextOps.learnBpeMerges(docs, "text", nMerges = 5)
    val b = TextOps.learnBpeMerges(docs, "text", nMerges = 5)
    assert(a == b && a.size == 5)
  }
}
