package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.HeavyHittersStream

/** The live MG skew monitor: bounded state, MG bounds preserved across
  * micro-batch replay (any chunking), and the replayed stream's final
  * sketch passes the exact-side audit that q_heavy_hitters_approx
  * declares — the mergeability theorem, exercised through the state
  * store instead of a batch shuffle. */
class HeavyHittersStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val capacity = 8

  /** Replay `chunks` through the complete-mode sketch stream; returns
    * every trigger's (sketch map, n). */
  private def run(chunks: Seq[Seq[String]]): Seq[(Map[String, Long], Long)] = {
    val input = MemoryStream[String](spark)
    val out = HeavyHittersStream.sketchStream(
      input.toDF().toDF("k"), "k", capacity)
    val got = scala.collection.mutable.ArrayBuffer[(Map[String, Long], Long)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hhstream").toString
    val q = out.writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
        got.synchronized {
          got ++= rows.map { r =>
            (r.getSeq[Row](0).map(e => e.getString(0) -> e.getLong(1)).toMap,
              r.getLong(1))
          }
        }
        ()
      }
      .start()
    try chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    finally q.stop()
    got.toSeq
  }

  private val keys: Seq[String] = {
    val rnd = new scala.util.Random(17)
    rnd.shuffle(
      (1 to 40).map(i => s"light$i") ++
        Seq.fill(60)("heavyA") ++ Seq.fill(45)("heavyB") ++ Seq.fill(30)("heavyC"))
  }

  test("replayed stream's final sketch passes the batch exact-side audit; state bounded") {
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (chunkSize <- Seq(keys.size, 50, 7)) { // one batch, few, many
      val results = run(keys.grouped(chunkSize).toSeq)
      // every trigger's sketch is capacity-bounded — the state claim
      results.foreach { case (sk, _) =>
        assert(sk.size <= capacity, s"state must hold <= $capacity counters, got ${sk.size}")
      }
      val (sketch, n) = results.last
      assert(n == keys.size.toLong)
      val bound = n / (capacity + 1)
      // the heavyHittersChecked booleans, computed from the STREAM's
      // final sketch against the exact counts: undercount within bound,
      // every guaranteed-capture key present — deterministically true
      // for ANY micro-batch chunking (the mergeability theorem)
      sketch.foreach { case (k, est) =>
        val t = truth(k)
        assert(est <= t && t - est <= bound,
          s"chunk=$chunkSize key=$k est=$est true=$t bound=$bound")
      }
      truth.foreach { case (k, t) =>
        if (t > bound)
          assert(sketch.contains(k), s"chunk=$chunkSize heavy key $k (true=$t) missing")
      }
    }
  }

  test("restart from checkpoint resumes the sketch, not a fresh one") {
    val input = MemoryStream[String](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hhstream-restart").toString
    def start(in: MemoryStream[String]) = HeavyHittersStream
      .sketchStream(in.toDF().toDF("k"), "k", capacity)
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("hh_restart_out")
      .start()
    val (first, second) = keys.splitAt(keys.size / 2)
    val q1 = start(input)
    try { input.addData(first); q1.processAllAvailable() } finally q1.stop()
    val input2 = MemoryStream[String](spark)
    input2.addData(first) // replayed source offsets are the source's duty
    val q2 = start(input2)
    try { input2.addData(second); q2.processAllAvailable() } finally q2.stop()
    val row = spark.table("hh_restart_out").collect().last
    assert(row.getLong(1) == keys.size.toLong,
      "resumed count must cover both halves exactly once")
    val sketch = row.getSeq[Row](0).map(e => e.getString(0) -> e.getLong(1)).toMap
    val bound = keys.size.toLong / (capacity + 1)
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    sketch.foreach { case (k, est) =>
      assert(est <= truth(k) && truth(k) - est <= bound)
    }
  }

  test("null keys stay outside the streamed sketch's domain") {
    val input = MemoryStream[Option[String]](spark)
    val out = HeavyHittersStream.sketchStream(
      input.toDF().toDF("k"), "k", capacity)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hhstream-null").toString
    val q = out.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("hh_null_out").start()
    try {
      input.addData(Seq(Some("a"), None, Some("a"), None))
      q.processAllAvailable()
    } finally q.stop()
    val row = spark.table("hh_null_out").collect().head
    assert(row.getLong(1) == 2L)
    assert(row.getSeq[Row](0).map(e => e.getString(0) -> e.getLong(1)).toMap
      == Map("a" -> 2L))
  }
}
