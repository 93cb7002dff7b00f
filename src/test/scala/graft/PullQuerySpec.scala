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

  test("pull queries stay correct across a changelog-stream restart, before and after the first post-restart commit") {
    // the read-path composition of the restart contract
    // (StreamRestartSpec): stop the changelog query, restart on the
    // same checkpoint, and pull-query the RESUMED state — first before
    // any post-restart commit (the state must be last generation's, not
    // empty), then after one (resumed state + new events, never a
    // restarted-from-scratch table)
    import spark.implicits._
    ChangelogStream.configure(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pull-restart").toString
    val isDel = col("event_type") === "delete"
    def start(input: MemoryStream[ReplayEv]) = ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    def batchLive(evs: Seq[ReplayEv]): Long =
      graft.ops.Changelog
        .applyChangelog(evs.toDF(), Seq("user_id"), col("event_id"), isDel)
        .count()
    val batch1 = Seq(
      ReplayEv(1L, 10L, "insert", 1.0),
      ReplayEv(2L, 11L, "insert", 2.0),
      ReplayEv(3L, 12L, "insert", 3.0),
      ReplayEv(2L, 13L, "delete", 0.0))
    val batch2 = Seq(
      ReplayEv(2L, 15L, "insert", 9.0),  // re-insert after a pre-restart delete
      ReplayEv(1L, 16L, "update", 7.0),  // update of a pre-restart row
      ReplayEv(3L, 17L, "delete", 0.0))
    val input1 = MemoryStream[ReplayEv](spark)
    val q1 = start(input1)
    try { input1.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // restart: fresh source pre-loaded with the committed slice (offset
    // alignment — the StreamRestartSpec discipline)
    val input2 = MemoryStream[ReplayEv](spark)
    input2.addData(batch1)
    val q2 = start(input2)
    try {
      // BEFORE the first post-restart commit: the pull surface serves
      // the resumed generation's state
      assert(q2.isActive)
      assert(PullQuery.liveCount(spark, ckpt, isDel) == batchLive(batch1),
        "pre-commit pull count must serve the resumed state, not a fresh store")
      val r1 = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 1L).collect()
      assert(r1.length == 1 && r1(0).getAs[Long]("event_id") == 10L)
      assert(PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 2L).isEmpty,
        "the pre-restart tombstone must still delete after the restart")
      // AFTER the first post-restart commit: resumed state + new events
      input2.addData(batch2)
      q2.processAllAvailable()
      assert(PullQuery.liveCount(spark, ckpt, isDel) == batchLive(batch1 ++ batch2))
      val r2 = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 2L).collect()
      assert(r2.length == 1 && r2(0).getAs[Double]("value") == 9.0,
        "re-insert over a pre-restart tombstone must surface")
      val r1b = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 1L).collect()
      assert(r1b.length == 1 && r1b(0).getAs[Double]("value") == 7.0)
      assert(PullQuery.pointLookup(spark, ckpt, isDel, "user_id", 3L).isEmpty)
    } finally q2.stop()
  }

  test("pruned point lookup reads exactly one state partition and equals the full scan") {
    import spark.implicits._
    ChangelogStream.configure(spark)
    val input = MemoryStream[ReplayEv](spark)
    val stream = ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pruned").toString
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    val isDel = col("event_type") === "delete"
    try {
      // enough keys that every state partition is populated, plus a
      // delete and an update so the pruned read sees real lifecycle state
      input.addData((1L to 40L).map(k => ReplayEv(k, k * 10, "insert", k.toDouble)))
      q.processAllAvailable()
      input.addData(Seq(
        ReplayEv(7L, 900L, "update", 70.0),
        ReplayEv(9L, 901L, "delete", 0.0)))
      q.processAllAvailable()

      val nStateParts = new java.io.File(s"$ckpt/state/0").listFiles()
        .count(f => f.isDirectory && f.getName.forall(_.isDigit))
      assert(nStateParts > 1, "pruning is only evidenced with >1 state partition")

      for (k <- Seq(1L, 7L, 9L, 23L, 40L, 999L)) {
        val pruned = PullQuery.pointLookupPruned(spark, ckpt, isDel, "user_id", k)
        // THE pruning assertion: one input partition planned, not nStateParts
        assert(pruned.rdd.getNumPartitions == 1,
          s"key $k: pruned lookup planned ${pruned.rdd.getNumPartitions} partitions")
        val full = PullQuery.pointLookup(spark, ckpt, isDel, "user_id", k)
        assert(pruned.collect().toSeq == full.collect().toSeq, s"key $k mismatch")
      }
      // spot-check values through the pruned path
      val r7 = PullQuery.pointLookupPruned(spark, ckpt, isDel, "user_id", 7L).collect()
      assert(r7.length == 1 && r7(0).getAs[Long]("event_id") == 900L)
      assert(PullQuery.pointLookupPruned(spark, ckpt, isDel, "user_id", 9L).isEmpty)

      // freshness across further commits: the pruned path serves the NEW state
      input.addData(Seq(ReplayEv(23L, 950L, "update", -1.0)))
      q.processAllAvailable()
      val r23 = PullQuery.pointLookupPruned(spark, ckpt, isDel, "user_id", 23L).collect()
      assert(r23.length == 1 && r23(0).getAs[Long]("event_id") == 950L)
    } finally q.stop()
  }

  test("pruned point lookup falls back to the full scan when no snapshot is uploaded yet") {
    import spark.implicits._
    ChangelogStream.configure(spark)
    // changelog checkpointing ON: commits write changelog files only;
    // snapshots appear at the maintenance cadence (default 60 s), so a
    // fresh query has NONE — the serving path must still answer
    val key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val input = MemoryStream[ReplayEv](spark)
    val stream = ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pruned-fb").toString
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    val isDel = col("event_type") === "delete"
    try {
      input.addData((1L to 10L).map(k => ReplayEv(k, k, "insert", k.toDouble)))
      q.processAllAvailable()
      val nStateParts = new java.io.File(s"$ckpt/state/0").listFiles()
        .count(f => f.isDirectory && f.getName.forall(_.isDigit))
      val pruned = PullQuery.pointLookupPruned(spark, ckpt, isDel, "user_id", 4L)
      val zips = new java.io.File(s"$ckpt/state/0").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .count(f => f.getName.matches("""\d+\.(zip|snapshot)"""))
      if (zips == 0) // the intended scenario: fallback = full scan
        assert(pruned.rdd.getNumPartitions == nStateParts,
          "without a snapshot the lookup must fall back to scanning all partitions")
      val r = pruned.collect()
      assert(r.length == 1 && r(0).getAs[Double]("value") == 4.0)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
