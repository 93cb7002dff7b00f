package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GapFillSlot, GapFillStream}

/** Streamed gap-fill input row (top-level for encoders): `ts_us` is
  * event-time micros, converted to TimestampType at the source edge. */
case class GfEv(key: Long, ts_us: Long, seq: Long, value: Double)

/** Stream == batch for LOCF gap fill: after replay with the watermark
  * pushed past the data, the emitted slot rows equal
  * [[graft.ops.Windowing.gapFill]] row-for-row; late-but-in-delay events
  * land in their slot; slots drain on watermark advance alone. */
class GapFillStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val stepUs = 10_000_000L // 10-second grid
  private val sentinelKey = 999L

  private def run(chunks: Seq[Seq[GfEv]], delay: String): Seq[GapFillSlot] = {
    val input = MemoryStream[GfEv](spark)
    val out = GapFillStream.filled(
      input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
      "key", "ts", "seq", "value", stepUs, delay)
    val got = ArrayBuffer[GapFillSlot]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gfstream").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[GapFillSlot], _: Long) =>
        val rows = batch.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      // push the watermark far past the data so every interior slot
      // closes; the sentinel key itself stays trailing-silent (never
      // emitted) and is excluded from comparisons
      input.addData(Seq(GfEv(sentinelKey, 1_000_000_000_000L, 0L, 0.0)))
      q.processAllAvailable()
      // one more empty-data cycle lets armed event-time timers fire
      input.addData(Seq(GfEv(sentinelKey, 1_000_100_000_000L, 1L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    got.toSeq.filterNot(_.key == sentinelKey)
  }

  private def batchRows(evs: Seq[GfEv]): Seq[GapFillSlot] =
    graft.ops.Windowing.gapFill(
        evs.toDF("key", "ts_us", "seq", "value")
          .withColumn("ts_ns", col("ts_us") * 1000L),
        "key", "ts_ns", "seq", "value", stepNs = stepUs * 1000L)
      .collect()
      .map(r => GapFillSlot(r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq

  test("replayed stream equals batch gapFill row-for-row") {
    def t(slot: Long, off: Long): Long = slot * stepUs + off
    val evs = Seq(
      GfEv(1L, t(0, 100), 1, 1.0), GfEv(1L, t(0, 200), 2, 2.0), // slot 0: latest wins
      GfEv(1L, t(3, 0), 3, 3.0),                                // slots 1,2 filled
      GfEv(1L, t(5, 10), 4, 4.0),                               // slot 4 filled
      GfEv(2L, t(2, 0), 1, 9.0),                                // key 2 starts at slot 2
      GfEv(2L, t(2, 5), 0, 8.5),                                // earlier (ts,seq): loses
      GfEv(2L, t(6, 0), 2, 7.0))
    // delay must cover the cross-chunk skew (key 2's slot-2 rows arrive
    // chunks after key 1 has reached slot 5) or the watermark rightly
    // drops them and parity with batch cannot hold
    val chunks = Seq(evs.take(3), evs.slice(3, 5), evs.drop(5))
    val got = run(chunks, delay = "60 seconds")
      .sortBy(s => (s.key, s.slot_start_us))
    assert(got == batchRows(evs))
    // interior gap slots really are fills, observed slots are not
    assert(got.filter(_.filled).map(s => (s.key, s.slot_start_us / stepUs)).toSet ==
      Set((1L, 1L), (1L, 2L), (1L, 4L), (2L, 3L), (2L, 4L), (2L, 5L)))
  }

  test("late-but-in-delay event lands in its slot before it closes") {
    // base offset: an event at exactly epoch 0 equals the INITIAL
    // watermark and is dropped as late (ts <= wm) — real streams never
    // carry time zero, tests must not either
    def t(slot: Long, off: Long): Long = (slot + 1000) * stepUs + off
    val onTime = Seq(GfEv(1L, t(0, 0), 1, 1.0), GfEv(1L, t(1, 100), 2, 2.0))
    // slot-1 late arrival: 100s delay keeps every slot open across the
    // whole replay, so the late row must still claim slot 1
    val late = Seq(GfEv(1L, t(1, 500), 3, 5.0), GfEv(1L, t(3, 0), 4, 3.0))
    val got = run(Seq(onTime, late), delay = "100 seconds")
      .sortBy(_.slot_start_us)
    assert(got == batchRows(onTime ++ late))
    assert(got.find(_.slot_start_us == t(1, 0)).exists(s => s.value == 5.0 && !s.filled))
  }

  test("arrival-order independence: shuffled replay equals batch") {
    val rnd = new scala.util.Random(41)
    val evs = (0 until 60).map { i =>
      GfEv(i % 3L, (i / 3L) * stepUs * 2 + rnd.nextInt(1000), i.toLong,
        rnd.nextInt(100).toDouble)
    }
    val shuffled = rnd.shuffle(evs)
    // huge delay → nothing closes until the sentinel pushes the
    // watermark; ordering inside slots must still be (ts, seq)
    val got = run(shuffled.grouped(7).toSeq, delay = "1000 seconds")
      .sortBy(s => (s.key, s.slot_start_us))
    assert(got == batchRows(evs).sortBy(s => (s.key, s.slot_start_us)))
  }
}
