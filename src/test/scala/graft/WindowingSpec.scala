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
}
