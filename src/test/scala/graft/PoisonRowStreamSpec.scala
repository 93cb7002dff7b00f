package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{GapAlert, GapAlertStream, GapFillSlot, GapFillStream, NearDupCand, NearDupStream, RollingRow, RollingStream}

/** Poison-row input row shapes (top-level for encoders): every field an
  * Option so a NULL can reach the operator's source edge. */
case class PRHeartbeat(key: Option[Long], ts_us: Option[Long])
case class PREv(key: Option[Long], ts_us: Option[Long], seq: Option[Long], value: Option[Double])
case class PRDoc(doc_id: Option[Long], text: String, ts_us: Option[Long])

/** r20 review findings: one malformed row (NULL key / event time /
  * seq / value / id) must be IGNORED by the stateful streaming
  * operators, not crash the query — an unguarded null either dies in a
  * primitive tuple-encoder field or NPEs inside the state fold, and a
  * checkpoint restart re-reads the same poison row forever (the crash
  * LOOP is the real hazard: the pipeline can never progress past it).
  * Each case feeds poison among good rows and asserts the good rows'
  * results arrive and the poison contributed nothing. */
class PoisonRowStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val min = 60L * 1000000L

  private def drive[I, O](
      input: MemoryStream[I], out: DataFrame,
      chunks: Seq[Seq[I]], mode: String = "append")(collect: DataFrame => Seq[O]): Seq[O] = {
    val got = ArrayBuffer[O]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-poison").toString
    val q = out.writeStream
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = collect(batch.toDF())
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    finally q.stop()
    got.toSeq
  }

  test("GapAlertStream ignores NULL-key and NULL-ts heartbeats") {
    graft.streaming.ChangelogStream.configure(spark)
    val input = MemoryStream[PRHeartbeat](spark)
    val stream = input.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val alerts = GapAlertStream.alerts(stream, "key", "ts", gapUs = min, "0 seconds")
      .toDF()
    val got = drive(input, alerts, Seq(
      Seq(PRHeartbeat(Some(1L), Some(min)),
        PRHeartbeat(None, Some(2 * min)),   // null key: encoder death before
        PRHeartbeat(Some(2L), None)),       // null ts: NPE in micros before
      // advance the watermark far past key 1's gap so its alert fires
      Seq(PRHeartbeat(Some(9L), Some(30 * min))),
      Seq(PRHeartbeat(Some(9L), Some(31 * min))))) { df =>
      df.collect().map(r => GapAlert(r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(got.exists(_.key == 1L), s"the good heartbeat must still alert: $got")
    assert(!got.exists(_.key == 0L), "a NULL key must not become a phantom key 0")
  }

  test("GapFillStream ignores rows with NULL seq or value; RollingStream NULL seq") {
    graft.streaming.ChangelogStream.configure(spark)
    val input = MemoryStream[PREv](spark)
    val out = GapFillStream.filled(
      input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
      "key", "ts", "seq", "value", stepUs = 10 * 1000000L, "0 seconds").toDF()
    val got = drive(input, out, Seq(
      Seq(PREv(Some(1L), Some(min), Some(1L), Some(5.0)),
        PREv(Some(1L), Some(min + 20 * 1000000L), None, Some(6.0)),  // null seq
        PREv(Some(1L), Some(min + 20 * 1000000L), Some(2L), None)),  // null value
      Seq(PREv(Some(1L), Some(2 * min), Some(3L), Some(7.0))),
      Seq(PREv(Some(77L), Some(60 * min), Some(0L), Some(0.0))),
      Seq(PREv(Some(77L), Some(61 * min), Some(1L), Some(0.0))))) { df =>
      df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    }
    assert(got.exists(_._1 == 1L), s"good rows must still fill slots: $got")

    val rInput = MemoryStream[PREv](spark)
    val rOut = RollingStream.rolling(
      rInput.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
      "key", "ts", "seq", "value", windowNs = 10 * min * 1000L, "0 seconds").toDF()
    val rGot = drive(rInput, rOut, Seq(
      Seq(PREv(Some(1L), Some(min), Some(1L), Some(5.0)),
        PREv(Some(1L), Some(min + 1000000L), None, Some(9.0))), // null seq
      Seq(PREv(Some(1L), Some(2 * min), Some(2L), Some(7.0))),
      Seq(PREv(Some(88L), Some(60 * min), Some(0L), Some(0.0))))) { df =>
      df.collect().map(_.getLong(0)).toSeq
    }
    assert(rGot.contains(1L), s"good rows must still emit rolling rows: $rGot")
  }

  test("NearDupStream (watermarked) ignores NULL ids and NULL event times") {
    graft.streaming.ChangelogStream.configure(spark)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota"
    val input = MemoryStream[PRDoc](spark)
    val out = NearDupStream.candidatePairsWithinWatermark(
      input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us"),
      "doc_id", "text", "ts", "10 minutes").toDF()
    val got = drive(input, out, Seq(
      Seq(PRDoc(Some(1L), text, Some(min)),
        PRDoc(None, text, Some(min)),     // null id: encoder death before
        PRDoc(Some(9L), text, None)),     // null ts: NPE at ts.getTime before
      Seq(PRDoc(Some(2L), text, Some(2 * min)))), mode = "update") { df =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got.distinct == Seq((1L, 2L)),
      s"the near-dup pair must come from the two GOOD docs only: $got")
  }
}
