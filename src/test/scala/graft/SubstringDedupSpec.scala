package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextKernels
import graft.ops.TextOps

/** Span-level exact-substring dedup (Lee et al. 2021's ExactSubstr
  * contract): stride-1 window fingerprints, min-(id,pos) canonicals,
  * O(tokens+cuts) rebuild — including the tile-boundary case
  * q_paradup's fixed grid provably misses. */
class SubstringDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], span: Int) =
    TextOps.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", span)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("a duplicate span straddling the tile grid: paradup misses it, substringDedup cuts it") {
    // the shared 3-token span sits at token offset 2 in doc 0 and
    // offset 1 in doc 1 — neither is a multiple of the tile size, so
    // every FIXED 3-token tile differs between the docs
    val docs = Seq(
      (0L, "w1 w2 s1 s2 s3 w3"),
      (1L, "v1 s1 s2 s3 v2 v3"))
    val para = TextOps
      .paragraphDedup(docs.toDF("doc_id", "text"), "doc_id", "text", tileWords = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(para.forall(_._3 == 0L),
      s"the tile grid must provably miss the unaligned span: $para")
    assert(run(docs, span = 3) == Seq(
      (0L, "w1 w2 s1 s2 s3 w3", 0L, 6L), // first occurrence survives intact
      (1L, "v1 v2 v3", 3L, 6L)))         // later occurrence loses the span
  }

  test("overlapping duplicated windows merge into one maximal span (union, not sum)") {
    // doc 1 repeats doc 0's full 5 tokens: its windows at starts 0,1,2
    // are all duplicated and their covers union to [0,5) — removed is 5,
    // not 9, and the rebuilt text is exactly the non-shared tail
    val docs = Seq((0L, "a b c d e"), (1L, "a b c d e x"))
    assert(run(docs, span = 3) == Seq(
      (0L, "a b c d e", 0L, 5L),
      (1L, "x", 5L, 6L)))
  }

  test("identical docs: the min-id doc keeps everything, the other empties") {
    val docs = Seq((7L, "a b c d"), (3L, "a b c d"))
    assert(run(docs, span = 3) == Seq(
      (3L, "a b c d", 0L, 4L),
      (7L, "", 4L, 4L)))
  }

  test("intra-doc self-repetition: first occurrence kept, the rest cut") {
    val docs = Seq((0L, "x y z q q q x y z"))
    assert(run(docs, span = 3) == Seq(
      (0L, "x y z q q q", 3L, 9L)))
  }

  test("short, NULL, and unique docs pass through verbatim with honest counters") {
    val docs = Seq(
      (0L, "a b"),        // under the span length: no windows at all
      (1L, null),         // NULL text
      (2L, "u  v   w  t") // unique, irregular whitespace: NOT normalized
    )
    val got = TextOps
      .substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", spanWords = 3)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (0L, Some("a b"), 0L, 2L),
      (1L, None, 0L, 0L),
      (2L, Some("u  v   w  t"), 0L, 4L)))
  }

  test("skew posture: min/count canonicals partially aggregate — no window rank in the plan") {
    val df = Seq((0L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val plan = TextOps.substringDedup(df, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("windowFingerprints kernel: full windows only, md5 of the space-joined text") {
    val fps = TextKernels.windowFingerprints(UTF8String.fromString(" a  b c d "), 3)
    assert(fps.numElements() == 2) // starts 0 and 1 — no shorter tails
    val d = java.security.MessageDigest.getInstance("MD5")
    assert(java.util.Arrays.equals(
      fps.getBinary(0),
      d.digest("a b c".getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    assert(
      TextKernels.windowFingerprints(UTF8String.fromString("a b"), 3).numElements() == 0)
  }

  test("token conservation on a random corpus: removed + kept == total, at any partitioning") {
    // seeded random corpus with planted sharing: docs draw from a small
    // vocabulary so repeated >=L spans arise naturally
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val shared = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0L until 40L).map { i =>
      val own = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (i % 3 == 0) s"$own $shared" else own)
    }
    for (p <- Seq(1, 4, 16)) {
      val got = TextOps.substringDedup(
        docs.toDF("doc_id", "text").repartition(p), "doc_id", "text", spanWords = 4)
        .collect()
      assert(got.length == 40)
      got.foreach { r =>
        val kept = r.getString(1).split("\\s+").count(_.nonEmpty)
        assert(r.getLong(2) + kept == r.getLong(3),
          s"p=$p doc=${r.getLong(0)}: removed=${r.getLong(2)} kept=$kept total=${r.getLong(3)}")
      }
      // partitioning-independence: min-struct canonicals are a total
      // order, so the output is identical at any layout
      val one = TextOps.substringDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", spanWords = 4)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq == one)
    }
  }

  test("mass duplication: N identical docs keep exactly one intact copy") {
    val docs = (0L until 12L).map(i => (i, "p q r s t u v w"))
    val got = run(docs, span = 4)
    assert(got.count(_._2 == "p q r s t u v w") == 1)
    assert(got.count(_._2 == "") == 11)
    assert(got.find(_._2.nonEmpty).get._1 == 0L, "the min-id doc is the canonical survivor")
  }

  test("removeSpans kernel: single pointer pass handles nested/overlapping covers") {
    def rm(text: String, starts: Seq[Int], w: Int): String =
      TextKernels.removeSpans(
        UTF8String.fromString(text),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          starts.map(Int.box).toArray[Any]),
        w).toString
    assert(rm("a b c d e", Seq(0, 2), 2) == "e")
    assert(rm("a b c d e", Seq(1), 2) == "a d e")
    assert(rm("a b c d e", Seq(0, 1, 2, 3), 2) == "")
    // a cover running past the end of the doc clamps, not crashes
    assert(rm("a b c", Seq(2), 5) == "a b")
  }
}
