package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{RollingRow, RollingStream}

/** Streamed rolling-stats input row (top-level for encoders). */
case class RollEv(key: Long, ts_us: Long, seq: Long, value: Option[Double])

/** Stream == batch for trailing RANGE-frame stats: after replay with the
  * watermark pushed past the data, the emitted rows are BIT-equal to
  * [[graft.ops.Windowing.rollingStats]] (same DECIMAL(38,6) sum, same
  * guarded division), including same-instant peers, NaN and NULL
  * values, and out-of-order arrival within the delay. */
class RollingStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val windowNs = 100_000_000_000L // 100-second trailing frame
  private val sentinelKey = 999L

  private def run(chunks: Seq[Seq[RollEv]], delay: String): Seq[RollingRow] = {
    val input = MemoryStream[RollEv](spark)
    val out = RollingStream.rolling(
      input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
      "key", "ts", "seq", "value", windowNs, delay)
    val got = ArrayBuffer[RollingRow]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rollstream").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[RollingRow], _: Long) =>
        val rows = batch.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      // push the watermark far past the data so every pending row closes
      input.addData(Seq(RollEv(sentinelKey, 1_000_000_000_000L, 0L, Some(0.0))))
      q.processAllAvailable()
      // one more cycle lets armed event-time timers fire
      input.addData(Seq(RollEv(sentinelKey, 1_000_100_000_000L, 1L, Some(0.0))))
      q.processAllAvailable()
    } finally q.stop()
    got.toSeq.filterNot(_.key == sentinelKey)
  }

  private def batchRows(evs: Seq[RollEv]): Seq[RollingRow] =
    graft.ops.Windowing.rollingStats(
        evs.toDF("key", "ts_us", "seq", "value")
          .withColumn("ts_ns", col("ts_us") * 1000L),
        "key", "ts_ns", "seq", "value", windowNs)
      .collect()
      .map(r => RollingRow(
        r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toSeq

  private def key(r: RollingRow) = (r.key, r.ts_ns, r.seq)

  test("replayed stream is bit-equal to batch rollingStats, incl. peers and non-finite values") {
    def t(sec: Long): Long = (1000 + sec) * 1_000_000L // off epoch-zero
    val evs = Seq(
      RollEv(1L, t(0), 1, Some(10.0)),
      RollEv(1L, t(50), 2, Some(20.5)),
      RollEv(1L, t(100), 3, Some(30.25)), // exactly window-width after t(0): inclusive
      RollEv(1L, t(101), 4, Some(40.0)),  // t(0) drops out
      RollEv(1L, t(150), 5, Some(Double.NaN)), // NaN: row emitted, excluded from stats
      RollEv(1L, t(150), 6, Some(60.0)),  // same-instant peer
      RollEv(1L, t(150), 7, None),        // NULL value peer
      RollEv(2L, t(10), 8, Some(5.5)))
    val got = run(Seq(evs.take(4), evs.drop(4)), delay = "300 seconds")
      .sortBy(key)
    val expect = batchRows(evs).sortBy(key)
    // NaN != NaN under ==; compare through a canonical rendering
    def render(r: RollingRow) = r.copy(value = r.value.map(v => if (v.isNaN) -0.12345 else v))
    assert(got.map(render) == expect.map(render))
    assert(got.size == evs.size)
  }

  test("out-of-order arrival within the delay still lands in earlier rows' frames") {
    def t(sec: Long): Long = (1000 + sec) * 1_000_000L
    val evs = Seq(
      RollEv(1L, t(0), 1, Some(1.0)),
      RollEv(1L, t(30), 2, Some(2.0)),
      RollEv(1L, t(60), 3, Some(4.0)))
    // t(30) arrives LAST, two chunks after t(60) — the delay keeps both
    // earlier rows open, so its value must appear in t(30)'s and
    // t(60)'s frames exactly as batch computes them
    val shuffled = Seq(Seq(evs(0)), Seq(evs(2)), Seq(evs(1)))
    val got = run(shuffled, delay = "500 seconds").sortBy(key)
    assert(got == batchRows(evs).sortBy(key))
    assert(got.find(_.seq == 3).exists(_.sum_win.contains(7.0)))
  }

  test("state is horizon-bounded: events older than delay+window leave the buffer") {
    // long quiet gap: after the watermark passes t0 + delay, the early
    // events must not linger in state — probed indirectly by replaying a
    // long stream and asserting emissions stay correct while the final
    // state (via another emission round) never resurrects old frames
    def t(sec: Long): Long = (1000 + sec) * 1_000_000L
    val early = Seq(RollEv(1L, t(0), 1, Some(3.0)), RollEv(1L, t(10), 2, Some(4.0)))
    val late = Seq(RollEv(1L, t(5000), 3, Some(5.0))) // far beyond window
    val got = run(Seq(early, late), delay = "60 seconds").sortBy(key)
    assert(got == batchRows(early ++ late).sortBy(key))
    // the late row's frame holds only itself
    assert(got.find(_.seq == 3).exists(r => r.n_win == 1 && r.sum_win.contains(5.0)))
  }
}
