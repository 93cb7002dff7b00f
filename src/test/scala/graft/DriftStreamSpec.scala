package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DriftStream, DriftWindow}

/** Streamed drift-monitor input row (top-level for encoders). */
case class DriftEv(ts_us: Long, value: Double)

/** Stream == batch for the windowed KS drift monitor: every closed
  * window's statistic equals [[graft.ops.Relational.ksDrift]] run on
  * that window's slice against the same reference distribution. */
class DriftStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val windowNs = 60_000_000_000L // 1-minute windows
  private val sentinelTs = 1_000_000_000_000L

  private val reference: Map[Double, Long] =
    Map(1.0 -> 4L, 2.0 -> 3L, 3.0 -> 2L, 10.0 -> 1L)

  private def run(chunks: Seq[Seq[DriftEv]], delay: String): Seq[DriftWindow] = {
    val input = MemoryStream[DriftEv](spark)
    val out = DriftStream.ksAgainstReference(
      input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
      "ts", "value", windowNs, reference, delay)
    val got = ArrayBuffer[DriftWindow]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-driftstream").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[DriftWindow], _: Long) =>
        val rows = batch.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      input.addData(Seq(DriftEv(sentinelTs, 1.0)))
      q.processAllAvailable()
      input.addData(Seq(DriftEv(sentinelTs + 100_000_000L, 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    // exclude the sentinel's own window (its bucket START floors below
    // the sentinel timestamp)
    got.toSeq.filter(_.window_start_ns < sentinelTs * 1000L / 2)
  }

  private def batchKs(values: Seq[Double]): Double = {
    val refRows = reference.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)(v) }
    graft.ops.Relational.ksDrift(
        values.toDF("v"), refRows.toDF("v"), "v")
      .collect()(0).getAs[Double]("ks_stat")
  }

  test("every closed window's KS equals batch ksDrift on that window's slice") {
    def t(win: Long, offSec: Long): Long = (1000 * 60 + win * 60 + offSec) * 1_000_000L
    val w0 = Seq(1.0, 1.0, 2.0, 3.0, 2.0) // close to reference
    val w1 = Seq(50.0, 60.0, 50.0)        // drifted hard
    val w2 = Seq(1.0, 2.0, 3.0, 10.0)
    val evs =
      w0.zipWithIndex.map { case (v, i) => DriftEv(t(0, i.toLong), v) } ++
        w1.zipWithIndex.map { case (v, i) => DriftEv(t(1, i.toLong), v) } ++
        w2.zipWithIndex.map { case (v, i) => DriftEv(t(2, i.toLong), v) }
    // out-of-order replay across chunks; generous delay keeps windows
    // open until the sentinel closes them
    val rnd = new scala.util.Random(7)
    val got = run(rnd.shuffle(evs).grouped(4).toSeq, delay = "600 seconds")
      .sortBy(_.window_start_ns)
    assert(got.size == 3)
    assert(got.map(_.n_window) == Seq(5L, 3L, 4L))
    assert(got.forall(_.n_ref == 10L))
    val expected = Seq(w0, w1, w2).map(batchKs)
    got.map(_.ks_stat).zip(expected).foreach { case (s, b) =>
      assert(s == b, s"stream $s != batch $b")
    }
    // the drifted window really screams, the aligned ones do not
    assert(got(1).ks_stat == 1.0)
    assert(got(0).ks_stat < 0.4)
  }

  test("signed zero: a window holding -0.0 and 0.0 matches batch (one histogram cell)") {
    def t(offSec: Long): Long = (1000 * 60 + offSec) * 1_000_000L
    val evs = Seq(DriftEv(t(0), -0.0), DriftEv(t(1), 0.0), DriftEv(t(2), 1.0))
    val got = run(Seq(evs), delay = "30 seconds")
    assert(got.size == 1)
    // batch ksDrift groups the zeros into one value (Spark SQL
    // normalizes -0.0); the stream must agree
    assert(got.head.ks_stat == batchKs(Seq(0.0, 0.0, 1.0)))
  }

  test("windows close on watermark advance alone (timer path) and NaN rows are excluded") {
    def t(offSec: Long): Long = (1000 * 60 + offSec) * 1_000_000L
    val evs = Seq(DriftEv(t(0), 1.0), DriftEv(t(1), Double.NaN), DriftEv(t(2), 2.0))
    val got = run(Seq(evs), delay = "30 seconds")
    assert(got.size == 1)
    assert(got.head.n_window == 2L) // NaN never entered the histogram
    assert(got.head.ks_stat == batchKs(Seq(1.0, 2.0)))
  }
}
