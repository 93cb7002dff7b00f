package graft

import graft.ops.NearDup

/** Storage hygiene of the iterative connected-components collapse — the
  * round-5 defect class: every loop round `localCheckpoint`ed and nothing
  * was ever unpersisted, so each invocation stranded O(rounds) block sets
  * in executor storage until driver GC (and poisoned everything sharing
  * the JVM). These specs pin the contract so it cannot regress:
  * at most the tiny drop-set survives a local-mode call, and NOTHING
  * survives in the block manager when a (cluster-style) reliable
  * checkpoint dir is configured.
  *
  * Both use the 31-node adversarial chain: ~30 propagation rounds, so a
  * reintroduced per-round leak fails by an order of magnitude, not by 1.
  */
class CheckpointHygieneSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = (0L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  private def chain =
    ((1L until 30L).map(i => (i, i + 1)) :+ (30L, 0L)).toDF("id1", "id2")

  test("collapseNearDups retains at most the drop-set (every loop checkpoint released)") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite expects local-checkpoint mode")
    val before = sc.getPersistentRDDs.keySet
    val survivors = NearDup.collapseNearDups(docs, "doc_id", chain)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L)) // consumed AND correct
    val fresh = sc.getPersistentRDDs.keySet -- before
    assert(fresh.size <= 1,
      s"collapseNearDups leaked ${fresh.size} persistent RDDs (expected ≤ 1, the drop-set)")
  }

  test("with a reliable checkpoint dir, collapseNearDups leaves the block manager untouched") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val before = sc.getPersistentRDDs.keySet
      val survivors = NearDup.collapseNearDups(docs, "doc_id", chain)
        .collect().map(_.getLong(0)).toSet
      assert(survivors == Set(0L)) // the reliable path is the SAME algorithm
      val fresh = sc.getPersistentRDDs.keySet -- before
      assert(fresh.isEmpty,
        s"reliable-checkpoint mode must keep zero blocks, found ${fresh.size}")
      // and superseded rounds must DELETE their files (Spark's own cleaner
      // only does under non-default cleanCheckpoints=true): of ~30 rounds
      // plus edges, only the drop-set's checkpoint may remain on disk
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .toSeq
      assert(rddDirs.size <= 1,
        s"checkpoint FILES leaked: ${rddDirs.size} rdd-* dirs remain under $dir")
    } finally {
      // unset (private[spark]) so other suites keep local-checkpoint mode
      org.apache.spark.GraftSparkTestHooks.clearCheckpointDir(sc)
      Replay.wipe(dir)
    }
  }
}
