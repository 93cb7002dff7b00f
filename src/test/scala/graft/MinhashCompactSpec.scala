package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.NearDup

/** In-place generation-swap compaction of the appended MinHash
  * signature index (the Similarity.compactIndex discipline ported to
  * the signature layout): N appends → 1 file per part, probe equality
  * before/after, interruption heal. */
class MinhashCompactSpec extends SparkTestBase {

  private def parquetFilesPerPart(path: String): Map[String, Int] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("part="))
      .map(d => d.getName ->
        d.listFiles().count(f => f.getName.endsWith(".parquet")))
      .toMap
  }

  test("appends fragment the index; compaction folds to one file per part, same probe answers") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-mh-compact").toString + "/idx"
    // small nParts so every append touches every part → guaranteed
    // multi-file fragmentation after three appends
    NearDup.writeMinhashIndex(history.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", path, nParts = 4)
    Seq(2, 0).foreach(m =>
      NearDup.appendMinhashIndex(history.filter(pmod(col("doc_id"), lit(3)) === m),
        "doc_id", "text", path, nParts = 4))
    val fragmented = parquetFilesPerPart(path)
    assert(fragmented.values.exists(_ > 1),
      s"appends must fragment at least one part dir: $fragmented")
    def probe() = NearDup.probeMinhashIndex(path, history, incoming,
      "doc_id", "text", nParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe()
    assert(before.nonEmpty, "fixture must contain cross-slice near-dups")

    assert(NearDup.compactMinhashIndex(spark, path))
    val compacted = parquetFilesPerPart(path)
    assert(compacted.keySet == fragmented.keySet, "no part dir may vanish")
    assert(compacted.values.forall(_ == 1), s"one file per part after compaction: $compacted")
    assert(!new java.io.File(path + "__COMPACTING").exists(), "marker must clear")
    assert(!new java.io.File(path + "__old").exists())
    assert(!new java.io.File(path + "__compact").exists())
    assert(probe() == before, "compaction must never change probe answers")

    // appends keep working against the compacted generation
    NearDup.appendMinhashIndex(incoming, "doc_id", "text", path, nParts = 4)
    assert(parquetFilesPerPart(path).values.exists(_ > 1))

    // missing index: touches nothing, reports false
    assert(!NearDup.compactMinhashIndex(spark, path + "-nonexistent"))
  }

  test("interruption heal: partial pre-swap unions discard, mid-swap states finish") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-mh-heal").toString + "/idx"
    NearDup.writeMinhashIndex(history, "doc_id", "text", path, nParts = 4)
    NearDup.appendMinhashIndex(incoming.limit(5), "doc_id", "text", path, nParts = 4)
    def probe() = NearDup.probeMinhashIndex(path, history, incoming,
      "doc_id", "text", nParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe()
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

    // crash BEFORE the swap: marker + partial compact dir + intact live
    // index — heal must discard the partial union and re-compact fresh
    fs.mkdirs(new Path(path + "__compact/part=0"))
    fs.create(new Path(path + "__COMPACTING"), true).close()
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(probe() == before, "healed pre-swap state must probe identically")
    assert(parquetFilesPerPart(path).values.forall(_ == 1))

    // crash MID-swap: live renamed away, complete compact generation +
    // marker left behind — heal must promote the compact generation
    spark.read.parquet(path).repartition(col("part"))
      .write.partitionBy("part").mode("overwrite").parquet(path + "__compact")
    assert(fs.rename(new Path(path), new Path(path + "__old")))
    fs.create(new Path(path + "__COMPACTING"), true).close()
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(probe() == before, "healed mid-swap state must probe identically")
    assert(!new java.io.File(path + "__old").exists())
    assert(!new java.io.File(path + "__COMPACTING").exists())
  }
}
