package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IntervalJoinStream

/** Top-level (encoder-friendly) interval-join test records. */
case class PEv(user_id: Long, p_id: Long, p_ts: java.sql.Timestamp)
case class EEv(user_id: Long, e_id: Long, e_ts: java.sql.Timestamp)

/** Streaming interval-join contracts: stream==batch row equality on the
  * same data, watermark presence (the state-bounding half of the
  * operator's contract), and window boundary semantics. */
class IntervalJoinStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  private def runStream(
      purchases: Seq[PEv], errors: Seq[EEv], joinType: String = "inner"): Seq[(Long, Long, Long)] = {
    val pIn = MemoryStream[PEv](spark)
    val eIn = MemoryStream[EEv](spark)
    val out = IntervalJoinStream.intervalJoin(
      pIn.toDF(), eIn.toDF(),
      keys = Seq("user_id"), leftTs = "p_ts", rightTs = "e_ts",
      lowerSeconds = -600, upperSeconds = 0, delay = "5 minutes",
      joinType = joinType)
    val got = ArrayBuffer[(Long, Long, Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ij-test").toString
    val q = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map { r =>
          val e = r.fieldIndex("e_id")
          (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("p_id")),
            if (r.isNullAt(e)) -1L else r.getLong(e))
        }
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      pIn.addData(purchases)
      eIn.addData(errors)
      q.processAllAvailable()
      // advance both watermarks far past every event so leftOuter's
      // unmatched rows are provably unmatched and get emitted
      pIn.addData(Seq(PEv(-1L, -1L, ts(10000))))
      eIn.addData(Seq(EEv(-1L, -1L, ts(10000))))
      q.processAllAvailable()
    } finally q.stop()
    got.toSeq.filterNot(_._2 == -1L)
  }

  private def batchJoin(purchases: Seq[PEv], errors: Seq[EEv]): Seq[(Long, Long, Long)] =
    for {
      p <- purchases
      e <- errors
      if e.user_id == p.user_id &&
        e.e_ts.getTime > p.p_ts.getTime - 600000L && e.e_ts.getTime <= p.p_ts.getTime
    } yield (p.user_id, p.p_id, e.e_id)

  test("streamed interval join equals the batch inequality join on the same data") {
    val rnd = new scala.util.Random(3)
    val purchases = Seq.tabulate(60)(i => PEv((rnd.nextInt(4) + 1).toLong, i.toLong, ts(rnd.nextInt(90).toLong)))
    val errors = Seq.tabulate(120)(i => EEv((rnd.nextInt(5) + 1).toLong, (1000 + i).toLong, ts(rnd.nextInt(90).toLong)))
    val got = runStream(purchases, errors)
    assert(got.sorted == batchJoin(purchases, errors).sorted)
    assert(got.nonEmpty) // fixture actually exercises matches
  }

  test("boundary semantics match the batch operator: half-open (lower, upper]") {
    val purchases = Seq(PEv(1, 1, ts(20)))
    val errors = Seq(
      EEv(1, 10, ts(10)),  // == p_ts - 10 min: excluded
      EEv(1, 11, ts(11)),  // inside
      EEv(1, 12, ts(20)),  // == p_ts: included
      EEv(1, 13, ts(21)))  // after: excluded
    assert(runStream(purchases, errors).map(_._3).sorted == Seq(11L, 12L))
  }

  test("leftOuter emits unmatched purchases with NULL right side after the watermark closes") {
    val purchases = Seq(PEv(1, 1, ts(20)), PEv(2, 2, ts(20)))
    val errors = Seq(EEv(1, 10, ts(15)))
    val pIn = MemoryStream[PEv](spark)
    val eIn = MemoryStream[EEv](spark)
    val out = IntervalJoinStream.intervalJoin(
      pIn.toDF(), eIn.toDF(), Seq("user_id"), "p_ts", "e_ts",
      -600, 0, "5 minutes", joinType = "leftOuter")
    val got = ArrayBuffer[(Long, Option[Long])]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ij-outer").toString
    val q = out.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map { r =>
          val e = r.fieldIndex("e_id")
          (r.getLong(r.fieldIndex("p_id")), if (r.isNullAt(e)) None else Some(r.getLong(e)))
        }
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      pIn.addData(purchases); eIn.addData(errors)
      q.processAllAvailable()
      pIn.addData(Seq(PEv(-1L, -1L, ts(10000)))); eIn.addData(Seq(EEv(-1L, -1L, ts(10000))))
      q.processAllAvailable()
    } finally q.stop()
    val byP = got.filterNot(_._1 == -1L).toMap
    assert(byP(1L) == Some(10L))
    assert(byP(2L) == None) // no error for user 2 — emitted with NULL once provable
  }

  test("both sides carry watermarks — the state-bounding contract is in the plan") {
    val pIn = MemoryStream[PEv](spark)
    val eIn = MemoryStream[EEv](spark)
    val plan = IntervalJoinStream.intervalJoin(
      pIn.toDF(), eIn.toDF(), Seq("user_id"), "p_ts", "e_ts", -600, 0, "5 minutes")
      .queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(plan).size == 2, plan)
  }
}
