package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Changelog
import graft.streaming.ChangelogStream

/** Stream/batch consistency — the property the reference's STREAM-vs-TABLE
  * saga is about (README.md:185-194): the same events, in any batch
  * chunking, must materialize the same state as the batch replay. */
class ChangelogStreamSpec extends SparkTestBase {

  import spark.implicits._

  /** Run events through the streaming changelog in the given chunks,
    * returning every emitted change in emission order. */
  private def runStream(chunks: Seq[Seq[Ev]]): Seq[Ev] = {
    ChangelogStream.configure(spark)
    val input = MemoryStream[Ev](spark)
    val out = ChangelogStream.latestByKey[Long, Ev](input.toDS(), _.user_id, _.event_id)
    val emitted = ArrayBuffer[Ev]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-test").toString
    val q = ChangelogStream.emitChanges(out, ckpt) { (batch: Dataset[Ev], _: Long) =>
      val rows = batch.collect()
      emitted.synchronized { emitted ++= rows }
    }
    try {
      chunks.foreach { c =>
        if (c.nonEmpty) input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()
    emitted.toSeq
  }

  /** Final state from the emission log: latest emitted row per key, minus
    * tombstones (what a compacted sink topic would retain live). */
  private def finalState(emitted: Seq[Ev]): Map[Long, Ev] =
    emitted
      .groupBy(_.user_id)
      .map { case (k, evs) => k -> evs.maxBy(_.event_id) }
      .filter { case (_, ev) => ev.event_type != "delete" }

  private def batchState(events: Seq[Ev]): Map[Long, Ev] =
    Changelog
      .applyChangelog(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .as[Ev]
      .collect()
      .map(e => e.user_id -> e)
      .toMap

  private def lifecycleEvents: Seq[Ev] = {
    // Deterministic mixed workload: 20 keys, 200 events, ~1 in 6 deletes.
    val rnd = new scala.util.Random(11)
    (1L to 200L).map { seq =>
      val key = rnd.nextInt(20).toLong
      val tpe = if (rnd.nextInt(6) == 0) "delete" else "update"
      Ev(key, seq, tpe, rnd.nextInt(1000).toDouble)
    }
  }

  test("streaming state equals batch replay (single chunk)") {
    val events = lifecycleEvents
    assert(finalState(runStream(Seq(events))) == batchState(events))
  }

  test("streaming state equals batch replay regardless of chunking") {
    val events = lifecycleEvents
    val chunked = events.grouped(37).toSeq
    assert(finalState(runStream(chunked)) == batchState(events))
  }

  test("a batch emits a key at most once (per-key collapse within a batch)") {
    val events = Seq(
      Ev(1L, 1L, "update", 1.0),
      Ev(1L, 2L, "update", 2.0),
      Ev(1L, 3L, "update", 3.0)
    )
    val emitted = runStream(Seq(events))
    assert(emitted == Seq(Ev(1L, 3L, "update", 3.0)))
  }

  test("tombstones are emitted downstream, not swallowed (pass-through)") {
    val emitted = runStream(Seq(
      Seq(Ev(1L, 1L, "insert", 1.0)),
      Seq(Ev(1L, 2L, "delete", 0.0))
    ))
    assert(emitted == Seq(Ev(1L, 1L, "insert", 1.0), Ev(1L, 2L, "delete", 0.0)))
  }

  test("late lower-sequence events cannot resurrect a deleted key") {
    val emitted = runStream(Seq(
      Seq(Ev(1L, 1L, "insert", 1.0), Ev(1L, 3L, "delete", 0.0)),
      Seq(Ev(1L, 2L, "update", 2.0)) // late arrival, seq below the tombstone
    ))
    assert(finalState(emitted) == Map.empty)
    // ...and the late event emitted nothing (state unchanged).
    assert(emitted.map(_.event_id) == Seq(3L))
  }

  test("unchanged batches emit nothing (EMIT CHANGES, not EMIT ALL)") {
    val emitted = runStream(Seq(
      Seq(Ev(1L, 5L, "update", 1.0)),
      Seq(Ev(1L, 4L, "update", 9.0)), // stale
      Seq.empty
    ))
    assert(emitted.map(_.event_id) == Seq(5L))
  }

  test("checkpoint recovery: a restarted query resumes state instead of replaying") {
    // The reference recovers by replaying the whole topic into RocksDB
    // (TOMBSTONE_HANDLING_GUIDE.md:105-113); Structured Streaming
    // checkpointing is strictly stronger — state survives the restart and
    // only NEW data is processed.
    ChangelogStream.configure(spark)
    val input = MemoryStream[Ev](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-recovery-test").toString
    val emitted = ArrayBuffer[Ev]()
    def start() = ChangelogStream.emitChanges(
      ChangelogStream.latestByKey[Long, Ev](input.toDS(), _.user_id, _.event_id), ckpt) {
      (batch: Dataset[Ev], _: Long) =>
        val rows = batch.collect()
        emitted.synchronized { emitted ++= rows }
    }
    val q1 = start()
    input.addData(Seq(Ev(1L, 1L, "insert", 1.0), Ev(2L, 2L, "insert", 2.0)))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    try {
      // a STALE event for key 1 after restart: recovered state must reject it
      input.addData(Seq(Ev(1L, 0L, "update", 99.0), Ev(2L, 3L, "update", 4.0)))
      q2.processAllAvailable()
    } finally q2.stop()

    val finalRows = finalState(emitted.toSeq)
    assert(finalRows == Map(
      1L -> Ev(1L, 1L, "insert", 1.0),   // stale pre-restart-seq event rejected
      2L -> Ev(2L, 3L, "update", 4.0)))
  }

  test("the configured state store is RocksDB (reference protocol)") {
    ChangelogStream.configure(spark)
    assert(
      spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
  }
}
