package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CapChange, SourceCapStream}

/** Streamed source-cap input row (top-level for encoders). */
case class CapDoc(doc_id: Long, source: String)

/** Streaming parity for the source-cap quota: the folded add/evict
  * change log after replay equals the batch sourceCap survivor set, and
  * retraction really happens across micro-batches. */
class SourceCapStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def run(chunks: Seq[Seq[CapDoc]], cap: Int): Seq[CapChange] = {
    val input = MemoryStream[CapDoc](spark)
    val out = SourceCapStream.capped(input.toDF(), "doc_id", "source", cap)
    val got = ArrayBuffer[CapChange]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-capstream").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[CapChange], _: Long) =>
        val rows = batch.collect()
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  private def fold(changes: Seq[CapChange]): Set[Long] =
    changes.foldLeft(Set.empty[Long]) { (acc, c) =>
      if (c.action == "add") acc + c.id else acc - c.id
    }

  test("folded change log equals batch sourceCap over the driver fixture") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => CapDoc(r.getLong(0), r.getString(1))).toSeq
    // 3 uneven chunks: parity must hold across micro-batch boundaries
    val chunks = Seq(docs.take(100), docs.slice(100, 170), docs.drop(170))
    val changes = run(chunks, cap = 10)
    val batchIds = graft.ops.TextOps
      .sourceCap(Tables.documents(spark, sf001), "doc_id", "source", cap = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fold(changes) == batchIds)
    // arrival order must not matter: reversed replay, same final set
    val reversed = run(Seq(docs.reverse), cap = 10)
    assert(fold(reversed) == batchIds)
  }

  test("a later better-ranked arrival evicts an earlier winner (retraction emitted)") {
    // cap=1: stratum keeps the single smallest (md5, id). Feed ids one
    // per micro-batch; whichever id ranks best overall must survive and
    // every displaced interim winner must carry an explicit evict.
    val docs = (0L to 5L).map(CapDoc(_, "s"))
    val changes = run(docs.map(Seq(_)), cap = 1)
    val batchIds = graft.ops.TextOps
      .sourceCap(docs.toDF("doc_id", "source"), "doc_id", "source", cap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fold(changes) == batchIds)
    val evicted = changes.filter(_.action == "evict").map(_.id)
    // with 6 candidates arriving separately at cap=1, any interim winner
    // other than the final one must have been explicitly evicted
    val added = changes.filter(_.action == "add").map(_.id)
    assert(added.toSet -- batchIds == evicted.toSet)
    // per-stratum state never exceeds cap: the fold is a singleton
    assert(fold(changes).size == 1)
  }

  test("null stratum / null id rows are excluded, matching batch") {
    val rows = Seq(
      CapDoc(1L, "a"), CapDoc(2L, null.asInstanceOf[String]), CapDoc(3L, "a"))
    val changes = run(Seq(rows), cap = 5)
    assert(fold(changes) == Set(1L, 3L))
    assert(changes.forall(_.stratum == "a"))
  }
}
