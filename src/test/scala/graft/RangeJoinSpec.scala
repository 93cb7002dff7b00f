package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("rangeJoinCount matches the brute-force interval count (incl. negatives)") {
    val rnd = new scala.util.Random(11)
    // times straddle zero to exercise floor-division bucketing on negatives
    val left = Seq.tabulate(150)(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, rnd.nextInt(200).toLong - 100))
    val right = Seq.tabulate(400)(_ =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(200).toLong - 100))
    val (lower, upper) = (-15L, 5L)
    val expect = left.map { case (id, k, lt) =>
      id -> right.count(r => r._1 == k && r._2 > lt + lower && r._2 <= lt + upper).toLong
    }.toMap
    val got = Joins
      .rangeJoinCount(
        left.toDF("id", "k", "t"), right.toDF("k", "rt"),
        keys = Seq("k"), leftId = "id", leftTime = "t", rightTime = "rt",
        lower = lower, upper = upper, countName = "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("left rows with an empty window survive with count 0") {
    val l = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val r = Seq((1L, 500L)).toDF("k", "rt")
    val got = Joins.rangeJoinCount(l, r, Seq("k"), "id", "t", "rt", -10L, 0L, "n").collect()
    assert(got.length == 1 && got(0).getLong(1) == 0L)
  }

  test("boundary semantics: half-open (lower, upper]") {
    val l = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    // rt = 90 (== t+lower, excluded), 91 (included), 100 (== t+upper, included)
    val r = Seq((1L, 90L), (1L, 91L), (1L, 100L)).toDF("k", "rt")
    val got = Joins.rangeJoinCount(l, r, Seq("k"), "id", "t", "rt", -10L, 0L, "n").collect()
    assert(got(0).getLong(1) == 2L)
  }

  test("plan joins on (key, bucket) equi-keys — no nested-loop join") {
    val ev = Tables.withTsMicros(Tables.events(spark, sf001))
    val plan = Joins
      .rangeJoinCount(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "error"),
        Seq("user_id"), "event_id", "ts_us", "ts_us",
        -3600000000L, 0L, "n_errors")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
