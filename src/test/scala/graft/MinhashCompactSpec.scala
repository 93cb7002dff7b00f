package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.{Generations, NearDup}

/** Generation-pointer compaction of the appended MinHash signature
  * index (the graft.ops.Generations layout shared with
  * Similarity.compactIndex): N appends → 1 file per part, probe
  * equality before/after, crash-point resilience (uncommitted partials
  * never resolve and are swept), and — the property the layout exists
  * for — probes running CONCURRENTLY with compactions never fail and
  * never change answers. */
class MinhashCompactSpec extends SparkTestBase {

  private def genDir(path: String): String = {
    val root = new Path(path)
    Generations.currentDir(
      root.getFileSystem(spark.sessionState.newHadoopConf()), root).toUri.getPath
  }

  private def parquetFilesPerPart(path: String): Map[String, Int] = {
    val root = new java.io.File(genDir(path))
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("part="))
      .map(d => d.getName ->
        d.listFiles().count(f => f.getName.endsWith(".parquet")))
      .toMap
  }

  test("probe's degenerate (no-shingles-in-batch) early return keeps the id column's TYPE (r20)") {
    import spark.implicits._
    // a string-keyed index: the early return previously hardcoded
    // new_id/old_id as bigint, so a caller unioning daily probe frames
    // hit a type mismatch only on the day every doc was shingle-less
    val hist = Seq(
      ("doc-a", "one two three four five six seven eight nine ten"),
      ("doc-b", "one two three four five six seven eight nine eleven"))
      .toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-mh-strid").toString + "/idx"
    NearDup.writeMinhashIndex(hist, "id", "text", path, nParts = 4)
    val degenerate = NearDup.probeMinhashIndex(
      path, hist, Seq(("doc-x", "tiny")).toDF("id", "text"), "id", "text", nParts = 4)
    val normal = NearDup.probeMinhashIndex(path, hist, hist, "id", "text", nParts = 4)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.map(f => (f.name, f.dataType))
    assert(shape(degenerate) == shape(normal),
      s"degenerate probe schema drifted: ${shape(degenerate)} vs ${shape(normal)}")
    assert(degenerate.count() == 0)
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

    val gen1 = genDir(path)
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(genDir(path) != gen1, "compaction must flip to a new generation")
    // the previous generation survives as the grace copy for in-flight
    // probes; the NEXT compaction sweeps it — no unavailability window
    assert(new java.io.File(gen1).exists(), "grace generation must survive the flip")
    val compacted = parquetFilesPerPart(path)
    assert(compacted.keySet == fragmented.keySet, "no part dir may vanish")
    assert(compacted.values.forall(_ == 1), s"one file per part after compaction: $compacted")
    assert(probe() == before, "compaction must never change probe answers")

    // appends keep working against the compacted generation
    NearDup.appendMinhashIndex(incoming, "doc_id", "text", path, nParts = 4)
    assert(parquetFilesPerPart(path).values.exists(_ > 1))

    // missing index: touches nothing, reports false
    assert(!NearDup.compactMinhashIndex(spark, path + "-nonexistent"))
  }

  test("crash resilience: uncommitted partials never resolve, sweeps retire them and the grace copy") {
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

    // crash DURING a rebuild: a partial next generation without the
    // _GEN_DONE sentinel — readers must keep resolving the committed
    // generation, and the next compaction must sweep the partial
    val gen1 = genDir(path)
    fs.mkdirs(new Path(s"$path/gen-7/part=0"))
    assert(genDir(path) == gen1, "an uncommitted partial must not win resolution")
    assert(probe() == before, "a partial generation must not disturb probes")
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(!fs.exists(new Path(s"$path/gen-7")), "the partial must be swept")
    assert(probe() == before, "compaction after a crash must probe identically")
    assert(parquetFilesPerPart(path).values.forall(_ == 1))

    // crash AFTER the flip (cleanup is the next sweep's job): the grace
    // generation lingers until one more compaction retires it
    val gen2 = genDir(path)
    assert(fs.exists(new Path(gen1)), "grace generation expected after one compaction")
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(!fs.exists(new Path(gen1)), "two compactions later the old generation is gone")
    assert(fs.exists(new Path(gen2)), "the immediately-previous generation is the new grace copy")
    assert(probe() == before)
  }

  test("probes running concurrently with compactions never fail and never change answers") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-mh-conc").toString + "/idx"
    NearDup.writeMinhashIndex(history, "doc_id", "text", path, nParts = 4)
    def probe() = NearDup.probeMinhashIndex(path, history, incoming,
      "doc_id", "text", nParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe()
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    val prober = new Thread(() => {
      try {
        while (!stop) {
          assert(probe() == before, "a concurrent probe changed answers mid-compaction")
          probes.incrementAndGet()
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    prober.start()
    try {
      // three compaction cycles while probes hammer the index — each
      // flip overlaps whatever probe is mid-flight. Between cycles the
      // test enforces the layout's documented deployment bound (no probe
      // outlives a whole compaction cycle) DETERMINISTICALLY: wait for
      // two more COMPLETED probes after the flip — the first may have
      // started before it, the second certainly after, so every probe
      // still holding the pre-flip generation has drained before the
      // next cycle's sweep retires it.
      (1 to 3).foreach { _ =>
        val preFlip = probes.get()
        assert(NearDup.compactMinhashIndex(spark, path))
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (probes.get() < preFlip + 2 && failures.isEmpty
            && System.nanoTime() < deadline) Thread.sleep(50)
        assert(failures.isEmpty && probes.get() >= preFlip + 2,
          "prober stalled — cannot uphold the probe-lifetime bound")
      }
    } finally {
      stop = true
      prober.join(120000)
    }
    assert(failures.isEmpty, s"concurrent probes failed: ${failures.peek()}")
    assert(probes.get() > 0, "the prober must actually have overlapped the compactions")
  }

  test("producer lock serializes appends against compactions; probes stay lock-free") {
    val docs = Tables.documents(spark, sf001)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-mh-lock").toString + "/idx"
    NearDup.writeMinhashIndex(history, "doc_id", "text", path, nParts = 4)
    def probe() = NearDup.probeMinhashIndex(path, history, incoming,
      "doc_id", "text", nParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = probe()
    val (fs, root) = Generations.fsRoot(spark, path)
    // with the lock held (a producer mid-flight), every OTHER producer
    // fails fast — an append landing after a compaction's union read
    // would be silently dropped by the flip, so second-arrival refusal
    // is the enforced form of the quiesce-appends rule
    val token = Generations.acquireLock(fs, root, "mid-flight-producer")
    intercept[IllegalStateException](
      NearDup.appendMinhashIndex(incoming, "doc_id", "text", path, nParts = 4))
    intercept[IllegalStateException](NearDup.compactMinhashIndex(spark, path))
    intercept[IllegalStateException](
      NearDup.writeMinhashIndex(history, "doc_id", "text", path, nParts = 4))
    // readers never take the lock: probes keep answering while it is held
    assert(probe() == before, "probes must be lock-free")
    Generations.releaseLock(fs, root, token)
    // released: the refused producers proceed, and the lock cycles clean
    NearDup.appendMinhashIndex(incoming, "doc_id", "text", path, nParts = 4)
    assert(NearDup.compactMinhashIndex(spark, path))
    assert(!fs.exists(Generations.lockPath(root)),
      "append and compaction must each release the lock on completion")
  }
}
