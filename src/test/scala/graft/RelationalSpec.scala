package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkTestBase {

  import spark.implicits._

  test("exactSum survives NaN/Infinity under ANSI mode, summing only finite values") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val df = Seq(
      ("a", 1.5), ("a", Double.NaN), ("a", 2.5),
      ("b", Double.PositiveInfinity), ("b", Double.NegativeInfinity), ("b", 4.0)
    ).toDF("k", "v")
    val got = df
      .groupBy(col("k"))
      .agg(Relational.exactSumDouble(col("v")).as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(got == Map("a" -> 4.0, "b" -> 4.0))
  }

  test("exactSum of only-null/NaN groups is NULL (matches SQL SUM semantics)") {
    val df = Seq(("a", Double.NaN)).toDF("k", "v")
    val row = df.groupBy(col("k")).agg(Relational.exactSumDouble(col("v")).as("s")).collect()(0)
    assert(row.isNullAt(1))
  }

  test("exactSum is partitioning-independent (decimal accumulation)") {
    // 0.1 summed 1e5 times: double accumulation drifts, decimal does not.
    val df = spark.range(100000).select(lit(0.1).as("v"))
    val s1 = df.repartition(1).agg(Relational.exactSumDouble(col("v"))).collect()(0).getDouble(0)
    val s32 = df.repartition(32).agg(Relational.exactSumDouble(col("v"))).collect()(0).getDouble(0)
    assert(s1 == s32)
    assert(s1 == 10000.0)
  }

  test("groupAgg counts include NaN rows but sums exclude them") {
    val df = Seq(("a", 1.0), ("a", Double.NaN)).toDF("event_type", "value")
    val row = Relational.groupAgg(df, "event_type", "value").collect()(0)
    assert(row.getAs[Long]("cnt") == 2L)
    assert(row.getAs[Double]("sum_value") == 1.0)
  }

  test("projectUpper uppercases names and keeps order") {
    val df = Seq((1, "x")).toDF("id", "title")
    val out = Relational.projectUpper(df, Seq("id", "title"))
    assert(out.schema.fieldNames.toSeq == Seq("ID", "TITLE"))
  }

  test("topN is deterministic under ties via the secondary key") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 4.0)).toDF("id", "p")
    val got = Relational.topN(df, 2, col("p").desc, col("id").asc).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("pointLookup pushes an equality filter (plan contains PushedFilters)") {
    val plan = Relational
      .pointLookup(Tables.events(spark, sf001), "event_id", 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,42)]"), plan)
  }

  test("unionCounts covers each table once, ordered by name") {
    val t1 = Seq(1, 2, 3).toDF("x")
    val t2 = Seq(1).toDF("x")
    val got = Relational
      .unionCounts(Seq("zeta" -> t1, "alpha" -> t2))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(got == Seq(("alpha", 1L), ("zeta", 3L)))
  }

  test("rollupCounts emits per-pair, per-dim and grand-total rows") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 4.0)).toDF("t", "b", "value")
    val got = Relational.rollupCounts(df, Seq("t", "b"), "value")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (Some("a"), Some(1L), 1L, 1.0), (Some("a"), Some(2L), 1L, 2.0),
      (Some("b"), Some(1L), 1L, 4.0),
      (Some("a"), None, 2L, 3.0), (Some("b"), None, 1L, 4.0),
      (None, None, 3L, 7.0)))
  }

  test("topNPerGroup keeps n deterministic rows per key") {
    val df = Seq(
      ("x", 1L, 9.0), ("x", 2L, 9.0), ("x", 3L, 1.0),
      ("y", 4L, 5.0)
    ).toDF("g", "id", "v")
    val got = Relational.topNPerGroup(df, 2, Seq("g"), col("v").desc, col("id").asc)
      .select("g", "id", "rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == Set(("x", 1L, 1), ("x", 2L, 2), ("y", 4L, 1)))
  }

  test("nullGuard drops NULL and NaN, keeps finite and infinite") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(Double.PositiveInfinity))
      .toDF("v")
    val kept = df.filter(Relational.nullGuard(col("v"))).collect().map(_.getDouble(0)).toSet
    assert(kept == Set(1.0, Double.PositiveInfinity))
  }

  test("groupQuantilesDisc matches the sorted-rank model (endpoints, ties, singleton)") {
    val df = Seq(
      ("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)), ("a", Some(40L)), ("a", Some(50L)),
      ("a", None),                                    // NULL excluded from ranks and counts
      ("b", Some(7L)), ("b", Some(7L)), ("b", Some(9L)), // ties
      ("c", Some(42L))                                // singleton group
    ).toDF("g", "v")
    val got = Relational.groupQuantilesDisc(df, "g", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // model: value at 1-based rank floor(p*(n-1))+1
    assert(got("a") == ((10L, 30L, 50L)))
    assert(got("b") == ((7L, 7L, 9L)))
    assert(got("c") == ((42L, 42L, 42L)))
    // exact rank arithmetic against a driver-side model on fixture data
    val docs = Tables.documents(spark, sf001).select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val expect = docs.groupBy(_._1).map { case (l, vs) =>
      val sorted = vs.map(_._2).sorted
      def q(p: Double) = sorted(math.floor(p * (sorted.length - 1)).toInt)
      l -> ((q(0.5), q(0.9), q(0.99)))
    }
    val fixture = Relational
      .groupQuantilesDisc(Tables.documents(spark, sf001), "lang", "n_chars", Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fixture == expect)
  }

  test("pricingSummary matches an exact driver-side decimal model") {
    import BigDecimal.RoundingMode.HALF_UP
    val rows = Tables.lineitem(spark, sf001)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // model: the same double-expression products, each rounded once to
    // scale 6 (Spark's double→DECIMAL(38,6) cast), summed exactly
    def dec(x: Double) = BigDecimal(x).setScale(6, HALF_UP)
    val expect = rows.groupBy(r => (r._1, r._2)).map { case (k, vs) =>
      val sumQty = vs.map(v => dec(v._3)).sum
      k -> ((vs.length.toLong,
        sumQty.toDouble,
        vs.map(v => dec(v._4)).sum.toDouble,
        vs.map(v => dec(v._4 * (1.0 - v._5))).sum.toDouble,
        vs.map(v => dec(v._4 * (1.0 - v._5) * (1.0 + v._6))).sum.toDouble,
        sumQty.toDouble / vs.length))
    }
    val got = Relational.pricingSummary(Tables.lineitem(spark, sf001))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got == expect)
    // one scan, map-side-combined hash agg: exactly one exchange
    val plan = Relational.pricingSummary(Tables.lineitem(spark, sf001))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // agg + orderBy sort
  }

  test("profile reports per-column n/nulls/distinct/min/max/exact-sum, null-aware") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.5), None),
      (Some(2.5), Some(30.0)),
      (None, Some(10.0))
    ).toDF("a", "b")
    val got = Relational.profile(df, Seq("a", "b"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("a") == ((3L, 1L, 2L, 1.0, 2.5, 6.0)))
    assert(got("b") == ((3L, 1L, 2L, 10.0, 30.0, 50.0)))
    intercept[IllegalArgumentException](Relational.profile(df, Seq.empty))
    intercept[IllegalArgumentException](Relational.profile(df, Seq("a", "a")))
  }

  test("groupQuantilesApprox plans as ONE hash aggregate — no per-key window sort") {
    val docs = Tables.documents(spark, sf001)
    val approx = Relational.groupQuantilesApprox(docs, "lang", "n_chars", Seq(0.5, 0.9, 0.99))
      .queryExecution.executedPlan.toString
    val exact = Relational.groupQuantilesDisc(docs, "lang", "n_chars", Seq(0.5, 0.9, 0.99))
      .queryExecution.executedPlan.toString
    // the exact path's honest cost: a per-key Window sort
    assert(exact.contains("Window"), exact)
    // the sketch path: aggregate only, no window, no per-key sort
    assert(!approx.contains("Window"), approx)
  }

  test("groupQuantilesApproxChecked: exact columns match the exact path, bound check holds") {
    val docs = Tables.documents(spark, sf001)
    val ps = Seq(0.5, 0.9, 0.99)
    val checked = Relational.groupQuantilesApproxChecked(docs, "lang", "n_chars", ps)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val exact = Relational.groupQuantilesDisc(docs, "lang", "n_chars", ps)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(checked.keySet == exact.keySet)
    checked.foreach { case (lang, (p50, p90, p99, ok)) =>
      assert((p50, p90, p99) == exact(lang), lang)
      assert(ok, s"sketch estimate out of its rank bound for $lang")
    }
    // at fixture scale (n < accuracy) the sketch's rank error is < 1, so
    // the estimates should in fact BE data values inside a tight window —
    // the bound check above is the contract, this pins the regime
    val approx = Relational.groupQuantilesApprox(docs, "lang", "n_chars", ps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val values = docs.select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
    approx.foreach { case (lang, p50a) =>
      assert(values(lang).exists(_._2 == p50a), s"$lang p50 estimate not a data value")
    }
  }

  test("ksDrift computes the exact two-sample KS statistic (identical, shifted, ties)") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double]): (Long, Long, Long, Double) = {
      val r = Relational.ksDrift(a.toDF("x"), b.toDF("x"), "x").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // identical samples -> zero drift
    assert(ks(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) == ((3L, 3L, 3L, 0.0)))
    // disjoint shifted samples -> maximal drift 1.0
    assert(ks(Seq(1.0, 2.0), Seq(10.0, 11.0))._4 == 1.0)
    // hand-computed mixed case with ties: A={1,1,2,3}, B={2,3,3,4}
    // ECDF diffs at v=1,2,3,4: |.5-0|=.5, |.75-.25|=.5, |1-.75|=.25, 0
    val (na, nb, nv, stat) = ks(Seq(1.0, 1.0, 2.0, 3.0), Seq(2.0, 3.0, 3.0, 4.0))
    assert((na, nb, nv) == ((4L, 4L, 4L)) && stat == 0.5)
    // an EMPTY comparison side yields NULL ks_stat, not the silent NaN
    // that max() used to surface (r20 review finding) — the counts
    // still name WHICH side was empty
    val row = Relational.ksDrift(
      Seq(1.0, 2.0).toDF("x"), Seq.empty[Double].toDF("x"), "x").collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 0L && row.isNullAt(3),
      s"empty side must yield NULL ks_stat: $row")
    // both sides empty: zero rows (nothing to compare at all)
    assert(Relational.ksDrift(
      Seq.empty[Double].toDF("x"), Seq.empty[Double].toDF("x"), "x").count() == 0)
  }

  test("pivotAgg cross-tabs with declared values; absent pairs NULL; dup values rejected") {
    import spark.implicits._
    val df = Seq(
      ("a", "x", 1.5), ("a", "x", 2.5), ("a", "y", 10.0),
      ("b", "y", 3.0), ("b", "z", 7.0) // z not declared -> dropped
    ).toDF("g", "p", "v")
    val got = Relational.pivotAgg(df, "g", "p", Seq("x", "y"), "v").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(got(0).getDouble(1) == 4.0 && got(0).getDouble(2) == 10.0)
    assert(got(1).isNullAt(1), "absent (b, x) must be NULL")
    assert(got(1).getDouble(2) == 3.0)
    // declared values => NO extra distinct-values job: the plan is one
    // aggregate over the input, no second scan
    intercept[IllegalArgumentException](
      Relational.pivotAgg(df, "g", "p", Seq("x", "x"), "v"))
  }

  test("histogram: edges, hi-clamp, low drop, empty buckets surfaced, broadcast spine") {
    import spark.implicits._
    val df = Seq(-1.0, 0.0, 4.9, 5.0, 9.9, 20.0, 15.0, Double.NaN)
      .toDF("x") // lo=0 hi=15 n=3 -> width 5
    val h = Relational.histogram(df, "x", lo = 0.0, hi = 15.0, n = 3)
    val got = h.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 0.0, 5.0, 2L),   // 0.0, 4.9 (-1 dropped, NaN dropped)
      (1L, 5.0, 10.0, 2L),  // 5.0 (boundary -> upper bucket), 9.9
      (2L, 10.0, 15.0, 2L)  // 15.0 and 20.0 clamp into the last bucket
    ))
    assert(h.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "bucket-spine join must broadcast the n-row counts")
  }

  test("nullable group orderings put NULL groups LAST (the oracle engines' default)") {
    import spark.implicits._
    // the round-13 sweep: Spark asc defaults NULLS FIRST while DuckDB
    // defaults NULLS LAST — every declared ordering over a nullable
    // group/key column now pins NULLS LAST explicitly, so a NULL-bearing
    // input cannot diverge row order between engine and oracle
    val df = Seq((Some("b"), 1.0), (None, 2.0), (Some("a"), 3.0))
      .toDF("g", "v")
    val agg = Relational.groupAgg(df, "g", "v").collect()
    assert(agg.map(r => Option(r.getString(0))) ===
      Array(Some("a"), Some("b"), None), "NULL group must sort last")
    val mom = Relational.groupMoments(
      Seq((Some("b"), 1.0), (None, 2.0), (None, 3.0)).toDF("g", "v"), "g", "v")
      .collect()
    assert(mom.map(r => Option(r.getString(0))) === Array(Some("b"), None))
  }

  test("histogram and psiDrift drop infinite values (oracle CAST would error)") {
    import spark.implicits._
    // +inf would clamp into the last bucket via Spark's non-ANSI
    // cast(floor(inf) as long) while DuckDB errors — excluded both sides
    val df = Seq(1.0, 6.0, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x")
    val h = Relational.histogram(df, "x", lo = 0.0, hi = 10.0, n = 2)
    assert(h.collect().map(_.getLong(3)).toSeq == Seq(1L, 1L),
      "infinite values must not be counted in any bucket")
    val psi = Relational.psiDrift(df, df, "x", lo = 0.0, hi = 10.0, n = 2)
      .collect().head
    assert(psi.getAs[Long]("n_a") == 2L && psi.getAs[Long]("n_b") == 2L,
      "psi bucket totals must exclude infinite values")
  }

  test("zOutliers matches a driver-side exact-moment model and broadcasts the stats") {
    import spark.implicits._
    val vals = Seq.tabulate(20)(i => ("g", i.toLong, 10.0 + i * 0.1)) :+
      (("g", 99L, 1000.0)) // the planted outlier
    val df = vals.toDF("grp", "id", "v") union
      Seq(("h", 1L, Double.NaN), ("h", 2L, 5.0)).toDF("grp", "id", "v") union
      // constant group: sd = 0 -> div-by-zero z would be NaN/Inf, which
      // Spark orders ABOVE any threshold — must classify NOTHING
      Seq(("k", 1L, 7.0), ("k", 2L, 7.0), ("k", 3L, 7.0)).toDF("grp", "id", "v") union
      // an Infinity row must leave n AND the moments together, not skew
      // the mean the finite rows are judged against
      Seq(("m", 1L, Double.PositiveInfinity), ("m", 2L, 1.0), ("m", 3L, 1.2),
        ("m", 4L, 0.8)).toDF("grp", "id", "v")
    val out = Relational.zOutliers(df, "grp", "id", "v", z = 3.0)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    // driver model with the operator's exact arithmetic
    val xs = vals.map(_._3)
    val n = xs.size
    val mean = xs.sum / n
    val sd = math.sqrt((xs.map(x => x * x).sum - xs.sum * xs.sum / n) / (n - 1))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("g", 99L)))
    assert(math.abs(got.head._3 - (1000.0 - mean) / sd) < 1e-9)
    // group "h": single finite value -> sd NULL/NaN -> no outliers, no crash
    assert(!got.exists(_._1 == "h"))
    // group "k": zero variance -> NULL sd -> nothing classified
    assert(!got.exists(_._1 == "k"))
    // group "m": the Inf row neither appears nor skews the finite rows'
    // stats (mean 1.0 over the three finite values, none of them 3 sd out)
    assert(!got.exists(_._1 == "m"))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "per-group stats must broadcast back, never shuffle the fact side")
  }

  test("madOutliers matches a driver-side discrete-median model; zero-MAD and non-finite guards") {
    import spark.implicits._
    // group g: 1..21 plus two planted outliers big enough to drag a
    // mean/sd but not the medians
    val g = Seq.tabulate(21)(i => ("g", i.toLong, (i + 1).toDouble)) ++
      Seq(("g", 100L, 500.0), ("g", 101L, 600.0))
    // group k: majority-constant -> MAD 0 -> classifies nothing, even
    // though 99.0 deviates
    val k = Seq(("k", 1L, 7.0), ("k", 2L, 7.0), ("k", 3L, 7.0), ("k", 4L, 99.0))
    // group m: NaN/Inf rows leave ranks and classification alike
    val m = Seq(("m", 1L, Double.NaN), ("m", 2L, Double.PositiveInfinity),
      ("m", 3L, 1.0), ("m", 4L, 1.2))
    val df = (g ++ k ++ m).toDF("grp", "id", "v")
    val out = Relational.madOutliers(df, "grp", "id", "v", k = 3.0).collect()
    // driver model with the operator's exact rank arithmetic
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s((math.floor(0.5 * (s.size - 1)) + 1).toInt - 1)
    }
    val vals = g.map(_._3)
    val med = medianOf(vals)
    val mad = medianOf(vals.map(x => math.abs(x - med)))
    val expect = g.filter(t => math.abs(t._3 - med) > 3.0 * mad).map(t => (t._1, t._2))
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == expect)
    assert(!out.exists(_.getString(0) == "k"), "zero-MAD group must classify nothing")
    assert(!out.exists(_.getString(0) == "m"), "non-finite rows excluded; tiny group has no 3-MAD rows")
    // the planted outliers ARE caught (the robustness claim: the median
    // pair ignores the extremes that would inflate a z-score's sd)
    assert(out.map(_.getLong(1)).toSet.intersect(Set(100L, 101L)) == Set(100L, 101L))
  }

  test("madOutliers is two in-window median passes, no join; heavyHitters top-k is TakeOrdered") {
    val ev = Tables.events(spark, sf001)
    val madPlan = Relational.madOutliers(ev, "event_type", "event_id", "value")
      .queryExecution.executedPlan.toString
    // r21 shape: each median rides its own per-group window sort and is
    // delivered in-pass (max-when-at-rank over an unbounded frame) —
    // no aggregate tables, no joins back, the fact side evaluated once
    assert(!madPlan.contains("Join"), madPlan.take(1500))
    // exactly two data sorts (values, then deviations) feed the windows
    // plus the final determinism sort
    assert(madPlan.linesIterator.count(_.trim.startsWith("+- Sort")) <= 3, madPlan.take(1500))
    val hhPlan = Relational.heavyHitters(ev, "user_id", topK = 20)
      .queryExecution.executedPlan.toString
    // the cut is per-partition top-k + K-row driver merge, not a global
    // sort of every distinct key
    assert(hhPlan.contains("TakeOrderedAndProject"), hhPlan.take(1500))
  }

  test("heavyHitters shares divide exact counts; tie at the cut breaks by key; cum monotone") {
    import spark.implicits._
    // counts: a->4, b->3, c->3, d->2, e->1 ; top-3 cut ties b/c on 3 ->
    // key asc keeps b and c (both fit), d excluded at the cut vs c? No:
    // top3 = a,b,c. Tie INSIDE the cut (b,c) orders by key.
    val df = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d") ++ Seq("e")).toDF("k")
    val out = Relational.heavyHitters(df, "k", topK = 3).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 3L))
    val total = 13.0
    assert(out.map(_.getDouble(2)).toSeq == Seq(4 / total, 3 / total, 3 / total))
    assert(out.map(_.getDouble(3)).toSeq == Seq(4 / total, 7 / total, 10 / total))
  }
}
