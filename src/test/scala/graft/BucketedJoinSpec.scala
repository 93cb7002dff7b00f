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
