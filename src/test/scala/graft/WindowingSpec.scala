package graft

import org.apache.spark.sql.functions._
import graft.ops.Windowing

class WindowingSpec extends SparkTestBase {

  import spark.implicits._

  test("floorDiv is exact beyond double's 2^53 integer range") {
    val hourNs = 3600L * 1000000000L
    // Values straddling a bucket boundary near a realistic epoch-nanos
    // (~1.7e18, where IEEE division can mis-bucket by one).
    val boundary = 1723400000000000000L / hourNs * hourNs
    val samples = Seq(
      boundary - 1, boundary, boundary + 1,
      boundary + hourNs - 1, boundary + hourNs,
      0L, 1L, hourNs - 1, hourNs
    )
    val got = samples.toDF("ns")
      .select(Windowing.floorDiv(col("ns"), hourNs).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val expected = samples.map(ns => Math.floorDiv(ns, hourNs))
    assert(got == expected)
  }

  test("tumbleNanos buckets rows into the right hour with exact sums") {
    val hourNs = 3600L * 1000000000L
    val df = Seq(
      (0L * hourNs + 5L, "a", 1.0),
      (1L * hourNs - 1L, "a", 2.0),   // still hour 0
      (1L * hourNs, "a", 4.0),        // hour 1
      (1L * hourNs + 7L, "b", 8.0)
    ).toDF("ts_ns", "event_type", "value")
    val got = Windowing
      .tumbleNanos(df, col("ts_ns"), 3600,
        dims = Seq(col("event_type")),
        aggs = Seq(count(lit(1)).as("cnt"), graft.ops.Relational.exactSumDouble(col("value")).as("s")))
      .collect()
      .map(r => (r.getAs[Long]("window_start_sec"), r.getAs[String]("event_type"),
                 r.getAs[Long]("cnt"), r.getAs[Double]("s")))
      .toSet
    assert(got == Set((0L, "a", 2L, 3.0), (3600L, "a", 1L, 4.0), (3600L, "b", 1L, 8.0)))
  }

  test("hopNanos places each event in exactly width/hop windows") {
    val hourNs = 3600L * 1000000000L
    val df = Seq(
      (hourNs + 5L, "a", 1.0),          // hour 1 → windows starting at 0 and 3600
      (3 * hourNs + 7L, "b", 2.0)       // hour 3 → windows 7200 and 10800
    ).toDF("ts_ns", "event_type", "value")
    val got = Windowing
      .hopNanos(df, col("ts_ns"), widthSeconds = 7200, hopSeconds = 3600,
        dims = Seq(col("event_type")), aggs = Seq(count(lit(1)).as("cnt")))
      .collect()
      .map(r => (r.getAs[Long]("window_start_sec"), r.getAs[String]("event_type"), r.getAs[Long]("cnt")))
      .toSet
    assert(got == Set((0L, "a", 1L), (3600L, "a", 1L), (7200L, "b", 1L), (10800L, "b", 1L)))
  }

  test("sessionNanos splits islands on gaps greater than the session gap") {
    val m = 60L * 1000000000L // one minute in nanos
    val df = Seq(
      // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second)
      (1L, 1L, 0 * m), (1L, 2L, 10 * m), (1L, 3L, 20 * m),
      (1L, 4L, 60 * m), (1L, 5L, 65 * m),
      // user 2: single event
      (2L, 6L, 5 * m)
    ).toDF("user_id", "event_id", "ts_ns")
    val got = Windowing
      .sessionNanos(df, Seq("user_id"), col("ts_ns"), col("event_id"),
        gapNs = 30 * m, aggs = Seq(count(lit(1)).as("n")))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ns") / m, r.getAs[Long]("n")))
      .toSet
    assert(got == Set((1L, 0L, 3L), (1L, 60L, 2L), (2L, 5L, 1L)))
  }

  test("a gap exactly equal to the session gap does NOT split (strict >)") {
    val m = 60L * 1000000000L
    val df = Seq((1L, 1L, 0 * m), (1L, 2L, 30 * m)).toDF("user_id", "event_id", "ts_ns")
    val got = Windowing
      .sessionNanos(df, Seq("user_id"), col("ts_ns"), col("event_id"),
        gapNs = 30 * m, aggs = Seq(count(lit(1)).as("n")))
      .collect()
    assert(got.length == 1 && got(0).getAs[Long]("n") == 2L)
  }

  test("tumble (TimestampType flavor) emits aligned window bounds") {
    val df = Seq(
      ("2026-01-01 10:15:00", 1.0),
      ("2026-01-01 10:45:00", 2.0),
      ("2026-01-01 11:05:00", 4.0)
    ).toDF("s", "value").select(to_timestamp(col("s")).as("ts"), col("value"))
    val got = Windowing
      .tumble(df, col("ts"), "1 hour", dims = Seq.empty,
        aggs = Seq(sum(col("value")).as("s")))
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("s"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .toSet
    assert(got == Set(("10:00", 3.0), ("11:00", 4.0)))
  }

  test("windowQuantilesDisc matches the per-window sorted-rank model on the fixture") {
    val ev = Tables.events(spark, sf001)
    val got = Windowing
      .windowQuantilesDisc(ev, col("ts_ns"), 3600, "value", Seq(0.5, 0.95))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val rows = ev.select(col("ts_ns"), col("value")).collect()
      .filter(!_.isNullAt(1))
      .map(r => (Math.floorDiv(r.getLong(0), 3600000000000L) * 3600L, r.getDouble(1)))
    val model = rows.groupBy(_._1).map { case (w, vs) =>
      // java.lang.Double ordering ranks NaN greatest — Spark's sort order
      val sorted = vs.map(_._2).sorted(Ordering.by((d: Double) => java.lang.Double.valueOf(d)))
      def q(p: Double) = sorted(math.floor(p * (sorted.length - 1)).toInt)
      w -> ((q(0.5), q(0.95)))
    }
    assert(got.keySet == model.keySet)
    got.foreach { case (w, (p50, p95)) =>
      def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b
      assert(eq(p50, model(w)._1) && eq(p95, model(w)._2), s"window $w")
    }
  }

  test("gapFill: carry-forward over empty slots, latest-in-slot by (ts, seq), spans per key") {
    import spark.implicits._
    val step = 1000000000L * 60 // one minute
    def ns(min: Long, sec: Long = 0) = min * 60000000000L + sec * 1000000000L
    val df = Seq(
      // key 1: slots 10, 13 observed -> 11, 12 filled with 1.0
      (1L, ns(10), 1L, 1.0), (1L, ns(13), 2L, 4.0),
      // slot 13 has TWO events; later (ts, seq) must win
      (1L, ns(13, 30), 3L, 5.0),
      // key 2: a single slot -> one row, nothing filled
      (2L, ns(20), 4L, 9.0)
    ).toDF("user_id", "ts_ns", "event_id", "v")
    val got = graft.ops.Windowing
      .gapFill(df, "user_id", "ts_ns", "event_id", "v", step)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val stepUs = step / 1000
    assert(got.toSeq == Seq(
      (1L, 10 * stepUs, 1.0, false),
      (1L, 11 * stepUs, 1.0, true),
      (1L, 12 * stepUs, 1.0, true),
      (1L, 13 * stepUs, 5.0, false), // the slot's LATEST event, not the first
      (2L, 20 * stepUs, 9.0, false)))
    intercept[IllegalArgumentException](
      graft.ops.Windowing.gapFill(df, "user_id", "ts_ns", "event_id", "v", 500L))
    // the slot spine comes from the per-key min/max aggregate's
    // sequence-explode, never a cross join of keys x slots
    val plan = graft.ops.Windowing
      .gapFill(df, "user_id", "ts_ns", "event_id", "v", step)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Generate explode"), plan)
  }

  test("windowTopN: per-cell deterministic rank, cut at k, NaN/NULL excluded") {
    import spark.implicits._
    val hourNs = 3600L * 1000000000L
    val df = Seq(
      // window 0, type a: values 5,5,3,1 — tie on 5 breaks by event_id
      (0L * hourNs + 1, "a", 10L, 5.0),
      (0L * hourNs + 2, "a", 7L, 5.0),
      (0L * hourNs + 3, "a", 8L, 3.0),
      (0L * hourNs + 4, "a", 9L, 1.0),  // rank 4: cut
      (0L * hourNs + 5, "a", 11L, Double.NaN), // never ranks
      // window 0, type b: single row
      (0L * hourNs + 6, "b", 12L, 2.0),
      // window 1, type a
      (1L * hourNs + 1, "a", 13L, 4.0)
    ).toDF("ts_ns", "event_type", "event_id", "value")
    val got = Windowing
      .windowTopN(df, "ts_ns", 3600, Seq("event_type"), "value", "event_id", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "a", 1, 7L), (0L, "a", 2, 10L), (0L, "a", 3, 8L),
      (0L, "b", 1, 12L),
      (3600L, "a", 1, 13L)))
  }

  test("rollingStats trailing RANGE frame: inclusive bounds, same-ts peers, finite-only stats") {
    import spark.implicits._
    val w = 100L // windowNs
    val df = Seq(
      // key a: events at t=0,50,100,101,150(NaN),150,201
      (1L, 0L, 1, 10.0),
      (1L, 50L, 2, 20.0),
      (1L, 100L, 3, 30.0),  // t=100: [0,100] inclusive -> 10+20+30
      (1L, 101L, 4, 40.0),  // t=101: [1,101] -> 0 drops out -> 20+30+40
      (1L, 150L, 5, Double.NaN), // NaN row present, excluded from stats
      (1L, 150L, 6, 60.0),  // same-ts peer: both 150 rows see each other
      (1L, 201L, 7, 70.0),  // [101,201]: 40+60+70 (NaN excluded)
      // key b: isolated
      (2L, 0L, 8, 5.0)
    ).toDF("user_id", "ts_ns", "event_id", "value")
    val out = Windowing
      .rollingStats(df, "user_id", "ts_ns", "event_id", "value", windowNs = w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(4), if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))
    val expect = Seq(
      (1L, 0L, 1, 1L, 10.0),
      (1L, 50L, 2, 2L, 30.0),
      (1L, 100L, 3, 3L, 60.0),
      (1L, 101L, 4, 3L, 90.0),
      (1L, 150L, 5, 4L, 150.0), // frame [50,150]: 20+30+40+60; NaN row still emits
      (1L, 150L, 6, 4L, 150.0), // the same frame — peers symmetric
      (1L, 201L, 7, 3L, 170.0),
      (2L, 0L, 8, 1L, 5.0))
    assert(out.toSeq == expect)
    // avg = sum/n for every row with n > 0 (one IEEE division)
    val avgs = Windowing
      .rollingStats(df, "user_id", "ts_ns", "event_id", "value", windowNs = w)
      .collect()
    avgs.foreach { r =>
      if (r.getLong(4) > 0)
        assert(r.getDouble(6) == r.getDouble(5) / r.getLong(4))
      else assert(r.isNullAt(6))
    }
  }

  test("rollingStats: a finite value past DECIMAL(38,6)'s range is excluded from n AND sum") {
    import spark.implicits._
    // 1e33 is finite but outside the decimal cast — before the bound it
    // half-counted (in n, nulled out of the sum), skewing every frame
    // it touched; now it is excluded from both, like the oracle
    val df = Seq(
      (1L, 0L, 1, 10.0),
      (1L, 10L, 2, 1.0e33),
      (1L, 20L, 3, 20.0)
    ).toDF("user_id", "ts_ns", "event_id", "value")
    val out = Windowing.rollingStats(df, "user_id", "ts_ns", "event_id", "value", 100L)
      .collect().map(r => r.getInt(2) -> ((r.getLong(4), r.getDouble(5))))
    assert(out.toSeq == Seq(
      1 -> ((1L, 10.0)),
      2 -> ((1L, 10.0)),   // the 1e33 row still emits, contributes nothing
      3 -> ((2L, 30.0))))
  }

  test("rollingStats: all-NaN window emits n=0, NULL sum and avg") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1, Double.NaN)).toDF("user_id", "ts_ns", "event_id", "value")
    val r = Windowing.rollingStats(df, "user_id", "ts_ns", "event_id", "value", 10L).collect()(0)
    assert(r.getLong(4) == 0L && r.isNullAt(5) && r.isNullAt(6))
  }
}
