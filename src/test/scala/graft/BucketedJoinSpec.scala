package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketed

/** Bucketed co-located joins: the pre-paid-shuffle layout. The claim
  * that matters at 1000 executors is in the PLAN — a join of two
  * tables bucketed by their join keys with the same count must carry
  * NO Exchange on either side — so that is what this suite pins, plus
  * the correctness invariant that layout (matched or drifted) never
  * changes the answer. */
class BucketedJoinSpec extends SparkTestBase {

  private def withSmjForced[T](f: => T): T = {
    // force sort-merge join: at fixture scale the planner would rather
    // broadcast the small side, which ALSO has no exchange on the big
    // side and would make this assertion vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matched bucket layouts join with NO exchange; answers equal the shuffled join") {
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed-spec").toString
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_orderpriority")
    Bucketed.writeBucketedTable(li, "bspec_li", s"$root/li", "l_orderkey", 8)
    Bucketed.writeBucketedTable(ord, "bspec_ord", s"$root/ord", "o_orderkey", 8)
    withSmjForced {
      val joined = Bucketed
        .colocatedJoin(spark, "bspec_li", "bspec_ord", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // execute, then read the FINAL (AQE) plan
      val plan = joined.queryExecution.executedPlan.toString
      // no exchange keyed by EITHER join key: the join consumes the
      // bucket layout directly (the aggregate's own re-key by the
      // unrelated o_orderpriority is expected and stays)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle either side:\n$plan")
      // the AQE string prints Final + Initial plan copies, hence >= 2
      assert("Bucketed: true".r.findAllIn(plan).size >= 2,
        s"both scans must report the bucket layout:\n$plan")
      // correctness: identical to the plain shuffled join
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    }
  }

  test("bucketsFor sizes the layout from the data: floor at small rows, ⌈rows/target⌉ past it") {
    // the r17 verdict's one super-linear declared row was exactly a
    // fixture that pinned 8 buckets at any sf; this is the sizing the
    // declared q_colocated_join layout now derives from the larger side
    assert(Bucketed.bucketsFor(0L) == 8)
    assert(Bucketed.bucketsFor(60000L) == 8, "sf0.01 stays at the floor")
    assert(Bucketed.bucketsFor(65536L * 8) == 8)
    assert(Bucketed.bucketsFor(65536L * 8 + 1) == 9, "ceil, not floor division")
    assert(Bucketed.bucketsFor(600000L) == 10, "sf0.1 scales past the floor")
    assert(Bucketed.bucketsFor(600000L * 8) == 74, "x8 keeps per-bucket volume constant")
    assert(Bucketed.bucketsFor(600000L * 64) == 586, "x64 keeps scaling linearly")
    assert(Bucketed.bucketsFor(1000L, targetRowsPerBucket = 100L, floor = 4) == 10)
    intercept[IllegalArgumentException](Bucketed.bucketsFor(10L, targetRowsPerBucket = 0L))
  }

  test("bucketsFor caps at maxBuckets: count = min(ceiling, ⌈rows/target⌉)") {
    // the 100 TB extrapolation the r18 verdict named: ⌈10¹²/64Ki⌉ would
    // prescribe ~15 M buckets (a ≥15 M-file listing posture) — the cap
    // binds instead, and the EFFECTIVE per-bucket target grows with the
    // table past the ceiling
    // ...and BINDING says so on stderr (r19 advisor finding: the
    // effective-target shift must be visible at layout-decision time).
    // Capture asserts contains/not-contains the warning marker — never
    // global stderr SILENCE, which any background Spark/Derby thread
    // could break (r20 review finding)
    def captureErr[T](f: => T): (T, String) = {
      val buf = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(buf, true))
      val out = try f finally System.setErr(old)
      (out, buf.toString)
    }
    val (capped, warned) = captureErr(Bucketed.bucketsFor(1000000000000L))
    assert(capped == 65536)
    assert(warned.contains("cap binds"),
      s"binding cap must warn on stderr, got: '$warned'")
    // below the cap the data-derived count is untouched — and silent
    val (uncapped, silent) = captureErr(Bucketed.bucketsFor(600000L * 64))
    assert(uncapped == 586)
    assert(!silent.contains("cap binds"), "non-binding cap must not warn")
    // exactly at the boundary: ⌈rows/target⌉ == maxBuckets passes
    // through quietly; one past it binds (warning captured, not sprayed)
    val (atBoundary, bSilent) = captureErr(Bucketed.bucketsFor(65536L * 100, maxBuckets = 100))
    assert(atBoundary == 100 && !bSilent.contains("cap binds"))
    val (pastBoundary, bWarned) = captureErr(Bucketed.bucketsFor(65536L * 100 + 1, maxBuckets = 100))
    assert(pastBoundary == 100 && bWarned.contains("cap binds"))
    // a cap under the floor is a contradiction, not a silent clamp
    intercept[IllegalArgumentException](
      Bucketed.bucketsFor(10L, floor = 8, maxBuckets = 4))
  }

  test("bucketsForPartner reads the partner's recorded count; flat partners fail loudly") {
    // the refresh-one-side rule as a code path (r19 advisor finding):
    // the partner's CATALOG count is authoritative — a fresh bucketsFor
    // under a different cap/target would silently shuffle the pair
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed-partner").toString
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_orderpriority")
    Bucketed.writeBucketedTable(ord, "bpartner_ord", s"$root/ord", "o_orderkey", 12)
    assert(Bucketed.bucketsForPartner(spark, "bpartner_ord", Seq("o_orderkey")) == 12)
    // a count-match hashed by a DIFFERENT column would keep both
    // Exchanges — the same silent degradation by another door, so the
    // key mismatch is as loud as the missing spec (r20 review finding)
    val mism = intercept[IllegalArgumentException](
      Bucketed.bucketsForPartner(spark, "bpartner_ord", Seq("o_orderpriority")))
    assert(mism.getMessage.contains("bucketed by (o_orderkey)"), mism.getMessage)
    // a flat (non-bucketed) partner co-locates nothing: loud, not a guess
    spark.sql("DROP TABLE IF EXISTS bpartner_flat")
    ord.write.format("parquet").option("path", s"$root/flat")
      .saveAsTable("bpartner_flat")
    val e = intercept[IllegalArgumentException](
      Bucketed.bucketsForPartner(spark, "bpartner_flat", Seq("o_orderkey")))
    assert(e.getMessage.contains("no bucket spec"), e.getMessage)

    // ...and the scenario the helper exists FOR, end to end: REFRESH
    // the other side sized by the partner's recorded count (12 — not
    // what a fresh bucketsFor would derive) and the rejoined pair must
    // still carry no Exchange on either side
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    Bucketed.writeBucketedTable(li, "bpartner_li", s"$root/li", "l_orderkey",
      Bucketed.bucketsForPartner(spark, "bpartner_ord", Seq("o_orderkey")))
    withSmjForced {
      val joined = Bucketed
        .colocatedJoin(spark, "bpartner_li", "bpartner_ord", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"a partner-sized refresh must keep the join exchange-free:\n$plan")
    }
  }

  test("a scaled (non-default) matched count keeps the no-Exchange plan and the answer") {
    // the production sizing writes a data-derived count; the no-Exchange
    // property must not be an 8-bucket accident
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed-scaled").toString
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_orderpriority")
    val n = Bucketed.bucketsFor(math.max(li.count(), ord.count()),
      targetRowsPerBucket = 256L) // force past the floor at fixture scale
    assert(n > 8, s"fixture sizing must exercise a non-default count, got $n")
    Bucketed.writeBucketedTable(li, "bscaled_li", s"$root/li", "l_orderkey", n)
    Bucketed.writeBucketedTable(ord, "bscaled_ord", s"$root/ord", "o_orderkey", n)
    withSmjForced {
      val joined = Bucketed
        .colocatedJoin(spark, "bscaled_li", "bscaled_ord", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"scaled matched layout must stay exchange-free:\n$plan")
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    }
  }

  test("a drifted layout (mismatched bucket counts) degrades to a correct shuffled join") {
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed-drift").toString
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_orderstatus")
    Bucketed.writeBucketedTable(li, "bdrift_li", s"$root/li", "l_orderkey", 8)
    Bucketed.writeBucketedTable(ord, "bdrift_ord", s"$root/ord", "o_orderkey", 4)
    withSmjForced {
      val joined = Bucketed
        .colocatedJoin(spark, "bdrift_li", "bdrift_ord", "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want, "layout drift must never change the answer")
    }
  }
}
