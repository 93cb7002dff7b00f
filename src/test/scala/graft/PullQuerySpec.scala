package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ChangelogStream, PullQuery}

/** Pull queries against a LIVE changelog stream (the reference's
  * pull-query surface, TOMBSTONE_HANDLING_GUIDE.md:185-195): while the
  * query runs, point lookups and COUNT(*) over its state must equal the
  * batch changelog replay of everything fed so far — including tombstone
  * deletion, re-insert-after-delete, and freshness across batches. */
class PullQuerySpec extends SparkTestBase {

  test("mid-stream pull count and point lookups equal the batch changelog state") {
    import spark.implicits._
    ChangelogStream.configure(spark)
    val input = MemoryStream[ReplayEv](spark)
    val stream = ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pullquery").toString
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    val isDel = col("event_type") === "delete"
    def batchLive(evs: Seq[ReplayEv]): Long =
      graft.ops.Changelog
        .applyChangelog(evs.toDF(), Seq("user_id"), col("event_id"), isDel)
        .count()
    try {
      val batch1 = Seq(
        ReplayEv(1L, 10L, "insert", 1.0),
        ReplayEv(2L, 11L, "insert", 2.0),
        ReplayEv(3L, 12L, "insert", 3.0),
        ReplayEv(2L, 13L, "delete", 0.0),
        ReplayEv(1L, 14L, "update", 5.0))
      input.addData(batch1)
      q.processAllAvailable()
      assert(q.isActive, "pull queries must run against a RUNNING stream")
      // D2: mid-stream pull count == batch liveCount of events fed so far
      assert(PullQuery.liveCount(spark, ckpt, isDel) == batchLive(batch1))
      // D1: live key → its latest row; tombstoned key → no row
      val r1 = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 1L).collect()
      assert(r1.length == 1)
      assert(r1(0).getAs[Long]("event_id") == 14L && r1(0).getAs[Double]("value") == 5.0)
      assert(PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 2L).isEmpty)
      // the raw snapshot RETAINS the tombstone row (late-data correctness)
      assert(PullQuery.stateSnapshot(spark, ckpt).count() == 3)

      // more events while the query keeps running: re-insert after delete
      // (TOMBSTONE_HANDLING_GUIDE.md:197-205) and a fresh delete
      val batch2 = Seq(
        ReplayEv(2L, 15L, "insert", 9.0),
        ReplayEv(3L, 16L, "delete", 0.0))
      input.addData(batch2)
      q.processAllAvailable()
      assert(PullQuery.liveCount(spark, ckpt, isDel) == batchLive(batch1 ++ batch2))
      val r2 = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 2L).collect()
      assert(r2.length == 1 && r2(0).getAs[Double]("value") == 9.0)
      assert(PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 3L).isEmpty)
    } finally q.stop()
  }
}
