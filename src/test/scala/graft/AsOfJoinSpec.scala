package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def model(
      left: Seq[(Long, Long, String)],          // (key, t, payload)
      right: Seq[(Long, Long, Long)])           // (key, t, tie)
      : Seq[(Long, Long, String, Option[Long], Option[Long])] =
    left.map { case (k, t, p) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      if (m.isEmpty) (k, t, p, None, None)
      else {
        val best = m.maxBy(r => (r._2, r._3))   // latest time, then max tiebreak
        (k, t, p, Some(best._3), Some(best._2))
      }
    }

  test("asOfJoin matches the brute-force latest-at-or-before model") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i => ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(100).toLong, s"L$i"))
    val right = Seq.tabulate(300)(i => ((rnd.nextInt(6) + 1).toLong, rnd.nextInt(100).toLong, i.toLong))
    val l = left.toDF("k", "t", "p")
    val r = right.toDF("k", "t", "tie")
      .select(col("k"), col("t"), col("tie").as("r_tie"), col("t").as("r_t"))
    val got = AsOfJoin
      .asOfJoin(l, r, keys = Seq("k"), timeCol = "t",
        rightTieBreak = "r_tie", rightCols = Seq("r_tie", "r_t"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got.sorted == model(left, right).sorted)
  }

  test("asOfJoinSalted equals asOfJoin exactly, hot key and ties included") {
    val rnd = new scala.util.Random(11)
    // key 1 is hot: ~60% of the left side; equal-time collisions are
    // frequent (t in 0..40) so the tie rule is exercised under salting
    val left = Seq.tabulate(300) { i =>
      val k = if (rnd.nextInt(5) < 3) 1L else (rnd.nextInt(4) + 2).toLong
      (k, rnd.nextInt(40).toLong, s"L$i")
    }
    val right = Seq.tabulate(200)(i =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(40).toLong, i.toLong))
    val l = left.toDF("k", "t", "p")
    val r = right.toDF("k", "t", "tie")
      .select(col("k"), col("t"), col("tie").as("r_tie"), col("t").as("r_t"))
    def collectSorted(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long])))
      .toSeq.sorted
    val base = collectSorted(AsOfJoin.asOfJoin(
      l, r, Seq("k"), "t", "r_tie", Seq("r_tie", "r_t")))
    Seq(1, 7).foreach { s =>
      val salted = collectSorted(AsOfJoin.asOfJoinSalted(
        l, r, Seq("k"), "t", "r_tie", Seq("r_tie", "r_t"), salts = s))
      assert(salted == base, s"salts=$s diverged")
    }
  }

  test("asOfJoinSalted tolerates an unhashable (map) left payload column") {
    // the events table's props column is a map — hash() rejects MapType
    // at analysis time, so the salt hash must skip it (and still equal
    // the unsalted answer)
    val l = Seq((1L, 10L, "a"), (1L, 12L, "b"), (2L, 11L, "c"))
      .toDF("k", "t", "p")
      .withColumn("props", map(lit("src"), col("p")))
    val r = Seq((1L, 9L, 1L), (1L, 11L, 2L), (2L, 10L, 3L)).toDF("k", "t", "tie")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("t"), col("p"), col("props")("src"), col("tie"))
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    val base = rows(AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "tie", Seq("tie")))
    val salted = rows(AsOfJoin.asOfJoinSalted(l, r, Seq("k"), "t", "tie", Seq("tie"), salts = 4))
    assert(salted == base)
  }

  test("key-named and repeated right payload columns reject at the guard (r20)") {
    import spark.implicits._
    val l = Seq((1L, 10L, "lp")).toDF("k", "ts", "lv")
    val r = Seq((1L, 5L, "rv")).toDF("k", "ts", "rv")
    // a right payload column named like a JOIN KEY previously passed the
    // guard and emitted two output columns named "k" — failing only at
    // the first downstream select with AMBIGUOUS_REFERENCE
    val e = intercept[IllegalArgumentException](
      AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "rv", Seq("k")))
    assert(e.getMessage.contains("collide"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.asOfJoin(l, r, Seq("k"), "ts", "rv", Seq("rv", "rv")))
    assert(e2.getMessage.contains("repeat"), e2.getMessage)
  }

  test("same-instant right row matches (<=) and max tiebreak wins the tie") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "p")
    val r = Seq((1L, 10L, 1L), (1L, 10L, 9L), (1L, 9L, 5L)).toDF("k", "t", "tie")
    val got = AsOfJoin
      .asOfJoin(l, r, Seq("k"), "t", "tie", Seq("tie"))
      .collect()
    assert(got.length == 1 && got(0).getAs[Long]("tie") == 9L)
  }

  test("left rows before any right row keep NULL payload (left outer)") {
    val l = Seq((1L, 5L, "early"), (2L, 5L, "no-right-key")).toDF("k", "t", "p")
    val r = Seq((1L, 6L, 1L)).toDF("k", "t", "tie")
    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "tie", Seq("tie")).collect()
    assert(got.length == 2 && got.forall(_.isNullAt(3)))
  }

  test("plan is one keyed window — no cross/nested-loop join anywhere") {
    val ev = Tables.withTsMicros(Tables.events(spark, sf001))
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts_us")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
    val plan = AsOfJoin
      .asOfJoin(p, c, Seq("user_id"), "ts_us", "click_id", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
