package graft

import graft.ops.NearDup

/** Edit-distance near-dup: the PassJoin segment blocking must be
  * LOSSLESS — every pair the brute-force all-pairs Levenshtein finds,
  * the blocked join finds too (the oracle depends on it). Hand cases
  * cover each edit type at each position class (including a first-char
  * insertion, which shifts every segment — the case the ±maxDist
  * windows exist for), plus the short-string band routes. */
class EditDistanceSpec extends SparkTestBase {

  import spark.implicits._

  /** Classic unit-cost Levenshtein, the model the operator must match. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(docs: Seq[(Long, String)], prefixLen: Int = 32, maxDist: Int = 2) =
    NearDup
      .editDistancePairs(docs.toDF("doc_id", "text"), "doc_id", "text", prefixLen, maxDist)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet

  private def model(docs: Seq[(Long, String)], prefixLen: Int = 32, maxDist: Int = 2) =
    (for {
      (i1, t1) <- docs; (i2, t2) <- docs
      if i1 < i2
      d = lev(t1.take(prefixLen), t2.take(prefixLen))
      if d <= maxDist
    } yield (i1, i2, d)).toSet

  private val baseText = "the quick brown fox jumps over it" // 33 chars → full 32-prefix

  test("each edit type is found, including the all-shifting front insert") {
    val docs = Seq(
      1L -> baseText,
      2L -> baseText.updated(4, 'Q'), // substitution mid-string: dist 1
      // front insert shifts EVERY segment; the 32-char cut then also
      // drops the old char 32, so the prefix distance is 2 (insert +
      // tail deletion) — the windows must still catch the shifted match
      3L -> ("X" + baseText),
      4L -> baseText.drop(1), // front deletion: dist 2 after the cut
      5L -> (baseText.take(30) + "ZZ") // two tail substitutions: dist 2
    )
    val got = run(docs)
    assert(got == model(docs), s"got $got\nwant ${model(docs)}")
    // and the planted relationships really are found
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 2)) &&
      got.contains((1L, 4L, 2)) && got.contains((1L, 5L, 2)))
  }

  test("pairs past maxDist are excluded") {
    val docs = Seq(1L -> baseText, 2L -> baseText.replace("quick", "slow!!"))
    assert(run(docs) == model(docs))
  }

  test("short strings pair through the length bands — short↔short and short↔full") {
    val full = "abcdefghijklmnopqrstuvwxyz012345" // exactly 32
    val docs = Seq(
      1L -> full,
      2L -> full.take(31), // short↔full at distance 1
      3L -> "hello", // far short
      4L -> "hallo", // short↔short at distance 1
      5L -> "help" // short↔short at distance 2 from hello
    )
    val got = run(docs)
    assert(got == model(docs), s"got $got\nwant ${model(docs)}")
    assert(got.contains((1L, 2L, 1)) && got.contains((3L, 4L, 1)) && got.contains((3L, 5L, 2)))
  }

  test("identical prefixes emit the pair at distance 0") {
    val docs = Seq(1L -> (baseText + " alpha"), 2L -> (baseText + " omega"))
    assert(run(docs) == Set((1L, 2L, 0)))
  }

  test("blocking is lossless on random near-pair-rich corpora (randomized)") {
    // tiny alphabet + short strings at prefixLen=8, maxDist=2: dense
    // near-pairs, every length class (short/full/over) represented
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 25) {
      val docs = (1 to (2 + rnd.nextInt(11))).map { i =>
        val n = 4 + rnd.nextInt(9)
        i.toLong -> Seq.fill(n)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      }
      assert(
        run(docs, prefixLen = 8, maxDist = 2) == model(docs, prefixLen = 8, maxDist = 2),
        s"round $round corpus ${docs.mkString(", ")}")
    }
  }
}
