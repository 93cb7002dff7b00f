package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventAnalytics, Relational}

/** Behavioral-model + distribution-audit operators added in round 12:
  * Markov transitions, RFM segmentation, chi-squared independence, and
  * PSI drift — hand-computed fixtures pin the arithmetic the DuckDB
  * oracles then re-verify at sf0.01. */
class AnalyticsAuditSpec extends SparkTestBase {

  import spark.implicits._

  // (user_id, ts_ns, event_id, event_type)
  private def eventsDF(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("user_id", "ts_ns", "event_id", "event_type")

  test("transitions: pair counts and conditional probabilities") {
    // user 1: A,B,A,C → A→B, B→A, A→C ; user 2: A,B → A→B
    val df = eventsDF(Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "A"), (1L, 40L, 4L, "C"),
      (2L, 10L, 5L, "A"), (2L, 20L, 6L, "B")))
    val got = EventAnalytics
      .transitions(df, "user_id", "ts_ns", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 3L, 2.0 / 3),
      ("A", "C", 1L, 3L, 1.0 / 3),
      ("B", "A", 1L, 1L, 1.0)))
  }

  test("transitions: same-timestamp ties order by event id") {
    // both events at ts=10; event_id decides A-before-B, so the pair is
    // A→B, never B→A
    val df = eventsDF(Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B")))
    val got = EventAnalytics
      .transitions(df, "user_id", "ts_ns", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("A", "B")))
  }

  test("transitions: rows with a NULL key/ts/id/type do not participate") {
    val df = Seq(
      (Some(1L), Some(10L), Some(1L), Some("A")),
      (Some(1L), Some(20L), Some(2L), None: Option[String]), // dropped
      (Some(1L), Some(30L), Some(3L), Some("B")),
      (None: Option[Long], Some(40L), Some(4L), Some("C")) // dropped
    ).toDF("user_id", "ts_ns", "event_id", "event_type")
    val got = EventAnalytics
      .transitions(df, "user_id", "ts_ns", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // the dropped NULL-type row must not split A..B into two sequences
    assert(got.toSeq == Seq(("A", "B")))
  }

  test("rfm: tiles rank metric-descending with user-id tie-break") {
    // 5 users: recency/frequency/monetary each strictly ordered so every
    // user lands in their own quintile; user 1 is best on all three axes
    val rows = (1L to 5L).flatMap { u =>
      // user u: f = 6-u events (u=1 most frequent), last ts = 1000-u
      // (u=1 most recent), each value 10/u (u=1 highest spend)
      (0L until (6L - u)).map(i => (u, (1000L - u) * 1000L - i, u * 100L + i, 10.0 / u))
    }.toDF("user_id", "ts_ns", "event_id", "value")
    val got = EventAnalytics.rfm(rows, "user_id", "ts_ns", "value", nTiles = 5)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("segment")).toMap
    assert(got == Map(1L -> 111, 2L -> 222, 3L -> 333, 4L -> 444, 5L -> 555))
  }

  test("rfm: nTiles=1 collapses every user to segment 111") {
    val rows = Seq((1L, 10L, 1L, 5.0), (2L, 20L, 2L, 1.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val got = EventAnalytics.rfm(rows, "user_id", "ts_ns", "value", nTiles = 1)
      .collect().map(_.getAs[Int]("segment"))
    assert(got.toSeq == Seq(111, 111))
  }

  test("rfm: monetary accumulates exactly and frequency counts all events") {
    val rows = Seq((1L, 10L, 1L, 0.1), (1L, 20L, 2L, 0.2), (1L, 30L, 3L, 0.3))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val r = EventAnalytics.rfm(rows, "user_id", "ts_ns", "value").collect()(0)
    assert(r.getAs[Long]("frequency") == 3L)
    // DECIMAL(38,6) accumulation: exactly 0.600000, not 0.6000000000000001
    assert(r.getAs[Double]("monetary") == 0.6)
    assert(r.getAs[Long]("last_us") == 0L) // 30 ns floor-divides to 0 us
  }

  test("chi2: uniform independence gives chi2 = 0") {
    val df = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 3 }
      yield (a, b)).toDF("a", "b")
    val r = Relational.chi2Independence(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_rows") == 12L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 0.0)
  }

  test("chi2: perfect 2x2 association gives chi2 = n") {
    // x only with p, y only with q, 4 rows each: chi2 == n == 8
    val df = (Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val r = Relational.chi2Independence(df, "a", "b").collect()(0)
    assert(r.getAs[Double]("chi2") == 8.0)
    assert(r.getAs[Long]("dof") == 1L)
  }

  test("chi2: structural zero cells contribute their expected count") {
    // observed: (x,p)=2, (x,q)=2, (y,p)=4, (y,q) EMPTY — the zero cell
    // still contributes (0-e)²/e; hand-computed chi2 = 8/3
    val df = (Seq.fill(2)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++ Seq.fill(4)(("y", "p")))
      .toDF("a", "b")
    val r = Relational.chi2Independence(df, "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("chi2") - 8.0 / 3) < 1e-5)
  }

  test("psi: identical sides measure exactly zero") {
    val side = Seq(10.0, 20.0, 30.0, 120.0).toDF("v")
    val r = Relational.psiDrift(side, side, "v", lo = 0.0, hi = 100.0, n = 4).collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_buckets") == 4L)
    assert(r.getAs[Double]("psi") == 0.0) // every (pa-pb)·ln(pa/pb) term is exactly 0
  }

  test("psi: disjoint buckets measure large, symmetric drift") {
    val a = Seq.fill(10)(10.0).toDF("v") // all in bucket 0
    val b = Seq.fill(10)(90.0).toDF("v") // all in bucket 3
    val ab = Relational.psiDrift(a, b, "v", 0.0, 100.0, 4).collect()(0).getAs[Double]("psi")
    val ba = Relational.psiDrift(b, a, "v", 0.0, 100.0, 4).collect()(0).getAs[Double]("psi")
    assert(ab > 1.0, s"disjoint distributions must alarm, got $ab")
    assert(ab == ba, "PSI is symmetric by construction")
  }

  test("psi: histogram edge semantics — >= hi clamps into last bucket, < lo drops") {
    val a = Seq(150.0, -5.0).toDF("v") // 150 clamps to bucket 3; -5 drops
    val b = Seq(99.0).toDF("v") // bucket 3
    val r = Relational.psiDrift(a, b, "v", 0.0, 100.0, 4).collect()(0)
    assert(r.getAs[Long]("n_a") == 1L, "the below-lo row must not count")
    // both surviving rows share bucket 3 → identical smoothed shares → 0
    assert(r.getAs[Double]("psi") == 0.0)
  }

  test("kanon: only under-k combinations surface, ordered") {
    // (en, a)=3 risky, (en, b)=5 safe at k=4, (fr, a)=1 risky
    val df = (Seq.fill(3)(("en", "a")) ++ Seq.fill(5)(("en", "b")) ++ Seq(("fr", "a")))
      .toDF("lang", "source")
    val got = Relational.kAnonymityAudit(df, Seq("lang", "source"), k = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("en", "a", 3L), ("fr", "a", 1L)))
  }

  test("kanon: a passing corpus yields an empty audit") {
    val df = Seq.fill(10)(("en", "a")).toDF("lang", "source")
    assert(Relational.kAnonymityAudit(df, Seq("lang", "source"), k = 5).collect().isEmpty)
  }

  test("cube emits every dimension subset — rollup only the prefixes") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 3.0))
      .toDF("t", "b", "value")
    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    val cube = Relational.cubeCounts(df, Seq("t", "b"), "value").collect()
    val rollup = Relational.rollupCounts(df, Seq("t", "b"), "value").collect()
    assert(sets(cube) == Set((false, false), (false, true), (true, false), (true, true)))
    assert(sets(rollup) == Set((false, false), (false, true), (true, true)))
    // the per-b subtotal only cube has: b=1 spans both t groups
    val b1 = cube.find(r => r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) == 1L).get
    assert(b1.getLong(2) == 2L && b1.getDouble(3) == 4.0)
  }

  test("moments: Bernoulli groups give the textbook shape, constants give NULL") {
    val df = (Seq.fill(4)(("half", 0.0)) ++ Seq.fill(4)(("half", 1.0)) ++
      Seq.fill(2)(("third", 0.0)) ++ Seq(("third", 1.0)) ++
      Seq.fill(3)(("const", 7.0)))
      .toDF("g", "v")
    val rows = Relational.groupMoments(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val half = rows("half")
    assert(half.getDouble(2) == 0.5 && half.getDouble(3) == 0.25)
    assert(half.getDouble(4) == 0.0) // symmetric → zero skew
    assert(half.getDouble(5) == -2.0) // Bernoulli(1/2) excess kurtosis
    val third = rows("third") // Bernoulli(1/3): skew = (1-2p)/sqrt(p(1-p))
    assert(math.abs(third.getDouble(4) - (1 - 2.0 / 3) / math.sqrt(2.0 / 9)) < 1e-9)
    val const = rows("const") // zero variance → NULL shape
    assert(const.getDouble(3) == 0.0 && const.isNullAt(4) && const.isNullAt(5))
  }

  test("jsd: identical slices ~0, disjoint slices report ln 2, hand case matches") {
    import graft.ops.TextOps
    def jsd(rows: Seq[(String, String)]): Map[(String, String), (Long, Double)] =
      TextOps.jsdMatrix(rows.toDF("lang", "text"), "lang", "text")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
    // identical distributions: per-term contributions are exactly 0;
    // only the decimal-rounded shared-mass residue remains (≤ ~1e-6
    // per side — the documented exact-accumulation cost)
    val same = jsd(Seq("A" -> "x y z", "B" -> "x y z"))(("A", "B"))
    assert(same._1 == 3L && math.abs(same._2) <= 2e-6, same)
    // fully disjoint vocabularies: the pair must still appear, at the
    // JSD maximum ln 2 (the spine route, not the inner join)
    val disj = jsd(Seq("A" -> "x x y", "B" -> "p q"))(("A", "B"))
    assert(disj._1 == 0L)
    assert(math.abs(disj._2 - 0.693147) < 1e-6, disj)
    // hand case: A = {x:2/3, y:1/3}, B = {x:1/2, z:1/2}, shared = {x}
    val got = jsd(Seq("A" -> "x x y", "B" -> "x z"))(("A", "B"))
    val pa = 2.0 / 3; val pb = 0.5
    val contrib = BigDecimal(pa * math.log(2.0 * pa / (pa + pb))
      + pb * math.log(2.0 * pb / (pa + pb))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pab = BigDecimal(pa).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val qab = BigDecimal(pb).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ln2 = 0.6931471805599453
    val want = BigDecimal(0.5 * (contrib.toDouble + (1.0 - pab.toDouble) * ln2
      + (1.0 - qab.toDouble) * ln2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got._1 == 1L && got._2 == want.toDouble, s"got $got want $want")
  }

  test("classificationReport: hand-computed per-class metrics and NULL degeneracies") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: support 3, tp 2
      ("b", "b"), ("b", "c"), // b: support 2, tp 1
      ("c", "c"), // c: support 1, tp 1
      ("e", "d") // e never predicted, d never true
    ).toDF("label", "pred")
    val got = Relational.classificationReport(df, "label", "pred")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Double]("precision")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("recall")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("f1")).map(_.doubleValue))))
      .toMap
    assert(got("a") == ((3L, 2L, 2L, Some(1.0), Some(2.0 / 3),
      Some(2.0 * 1.0 * (2.0 / 3) / (1.0 + 2.0 / 3)))))
    assert(got("b") == ((2L, 2L, 1L, Some(0.5), Some(0.5), Some(0.5))))
    assert(got("c") == ((1L, 2L, 1L, Some(0.5), Some(1.0),
      Some(2.0 * 0.5 * 1.0 / 1.5))))
    // degenerate denominators are NULL, not fake zeros
    assert(got("d") == ((0L, 1L, 0L, Some(0.0), None, None))) // never true
    assert(got("e") == ((1L, 0L, 0L, None, Some(0.0), None))) // never predicted
  }

  test("boilerplateNgrams counts documents, never within-doc repeats") {
    import graft.ops.TextOps
    val docs = Seq(
      "spam spam spam spam", // the 3-gram repeats WITHIN the doc → df 1
      "spam spam spam x",
      "a b c").toDF("text")
    val got = TextOps.boilerplateNgrams(docs, "text", n = 3, minDf = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("spam spam spam", 2L)))
  }

  test("disorder: regressions count against the running max, not the previous row") {
    // key 1 in seq order: ts = 100, 300, 200, 250, 400
    //   200 is 100 behind the running max 300; 250 is 50 behind; 400 ok
    // → 2 regressions, max_late = 100 ns → 0 us (floor)… use us-scale ns
    val rows = Seq(
      (1L, 100000L, 1L), (1L, 300000L, 2L), (1L, 200000L, 3L),
      (1L, 250000L, 4L), (1L, 400000L, 5L),
      (2L, 10000L, 6L), (2L, 20000L, 7L)) // perfectly ordered key
      .toDF("user_id", "ts_ns", "event_id")
    val got = EventAnalytics.disorderAudit(rows, "user_id", "ts_ns", "event_id")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_regressions"),
        Option(r.getAs[java.lang.Long]("max_late_us")).map(_.longValue)))
    assert(got.toSeq == Seq(
      (1L, 5L, 2L, Some(100L)), // max late: 300000−200000 ns = 100 us
      (2L, 2L, 0L, None))) // ordered key: no regressions, NULL worst case
  }
}
