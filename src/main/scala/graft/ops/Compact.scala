package graft.ops

import org.apache.spark.sql.SparkSession

/** Abort-on-false Hadoop FileSystem steps shared by the index
  * compactors ([[Similarity.compactIndex]], [[NearDup.compactMinhashIndex]]):
  * FileSystem reports failure by RETURNING FALSE, not throwing, and a
  * destructive step that continues past a failed rename deletes data
  * whose rows never landed — both swaps must abort with their marker
  * intact so the next call's heal path finishes or unwinds. Factored so
  * a fix to the failure discipline cannot silently miss one copy
  * (round-13 review finding). */
private[ops] object FsSteps {
  def renamed(
      fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path,
      ctx: String): Unit =
    require(fs.rename(src, dst),
      s"$ctx: rename $src -> $dst returned false; aborting with marker intact")

  def deleted(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      recursive: Boolean,
      ctx: String): Unit =
    if (fs.exists(p)) require(fs.delete(p, recursive),
      s"$ctx: delete $p returned false; aborting with marker intact")
}

/** Small-file compaction for a parquet corpus — the operational
  * counterpart of the streaming sinks: a micro-batch parquet sink
  * appends at least one file per batch per partition, and a week of
  * 2-second triggers turns a corpus into millions of KB-sized files
  * whose open/footer overhead dominates every downstream scan.
  *
  * Compaction writes a NEW generation directory (never in place — the
  * source may be a live streaming sink whose `_spark_metadata` commit
  * log and in-flight readers must stay untouched) sized to
  * `targetFileBytes`: file count = ⌈input bytes / target⌉, data
  * round-robin-repartitioned so output files are uniform. The caller
  * swaps readers to the new generation and retires the old one — the
  * same generation pattern as the persisted ANN index rebuilds. */
object Compact {

  /** Compact `srcDir` (parquet) into `destDir`; returns the task count
    * sized from the input bytes. `targetFileBytes` defaults to 128 MiB —
    * the usual scan-friendly parquet size. `partitionBy` preserves a
    * directory-partitioned layout (e.g. the lang-partitioned corpus):
    * tasks are then CLUSTERED by the partition columns so each output
    * partition directory receives coalesced files rather than one
    * fragment per task. */
  def corpus(
      spark: SparkSession,
      srcDir: String,
      destDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    // Alias-proof overwrite guard: a raw string compare passes trailing
    // slashes, relative-vs-absolute spellings, or ".." segments naming
    // the SAME directory and the mode("overwrite") below would then
    // clobber the live source generation. Compare fully-qualified paths
    // with dot-segments resolved (URI.normalize — makeQualified alone
    // keeps ".." literal, so src+"/../<srcname>" would slip through),
    // and reject nesting in either direction (dest inside src is
    // destroyed by the overwrite; src inside dest is read while being
    // rewritten). Symlink aliases are out of scope — a generic
    // FileSystem has no realpath; callers juggling symlinked
    // generations must pass resolved paths.
    def norm(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
      fs.makeQualified(new org.apache.hadoop.fs.Path(p.toUri.normalize()))
    val qSrc = norm(src)
    val qDest = norm(new org.apache.hadoop.fs.Path(destDir))
    def contains(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Boolean = {
      var p: org.apache.hadoop.fs.Path = b
      while (p != null && p != a) p = p.getParent
      p != null
    }
    require(qDest != qSrc && !contains(qSrc, qDest) && !contains(qDest, qSrc),
      s"compaction must write a disjoint new generation directory ($qSrc vs $qDest)")
    val it = fs.listFiles(src, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val sized =
      if (partitionBy.isEmpty) df.repartition(files)
      else df.repartition(files, partitionBy.map(org.apache.spark.sql.functions.col): _*)
    val writer = sized.write.mode("overwrite")
    (if (partitionBy.isEmpty) writer else writer.partitionBy(partitionBy: _*))
      .parquet(destDir)
    files
  }
}
