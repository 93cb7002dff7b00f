package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale validation for the near-dup / ANN path (the first
  * empirical backing for the 100 TB shape claims in PLANS.md): tile the
  * sf0.1 `documents`/`embeddings` fixtures ×8 the same distributed way
  * the replay bench tiles its event log (cross-join with the copy
  * index — no driver-side array anywhere), run q_neardup_minhash /
  * q_neardup_simhash / q_sim_topk_ivf at ×1 and ×8, and check
  * near-linear wall-time growth plus a driver heap that does not grow
  * with the data.
  *
  * Tiled documents are MUTATED per copy (vowels translated through a
  * copy-specific alphabet) so copies of the same doc are NOT near-dups
  * of each other: the corpus behaves like 8 disjoint sub-corpora and
  * the true pair set grows ~linearly — without this, every doc forms a
  * 28-pair clique with its own copies and the OUTPUT (not the
  * algorithm) grows quadratically in the tile factor, which would make
  * a wall-time linearity check meaningless. Embeddings are tiled
  * unmutated (ANN probe cost is bucket-local, ties are harmless).
  *
  * Run: sbt "Test/runMain graft.ScaleProbe /root/testdata/sf0.1 32 8"
  */
object ScaleProbe {

  /** Per-copy vowel alphabets: copy 0 is the identity (the original
    * corpus embeds unchanged), others remap vowels so word shingles
    * differ across copies. */
  private val vowelMaps = Vector(
    "aeiou", "bcdfg", "hjklm", "npqrs", "tvwxz", "01234", "56789", "zyxwv",
    "qwert", "asdfg")

  def tileDocuments(spark: SparkSession, sfDir: String, outDir: String, copies: Int): Long = {
    require(copies <= vowelMaps.length, s"at most ${vowelMaps.length} copies")
    val base = Tables.documents(spark, sfDir)
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val mutated = vowelMaps.take(copies).zipWithIndex.drop(1)
      .foldLeft(when(col("copy") === 0, col("text"))) {
        case (acc, (m, i)) =>
          acc.when(col("copy") === i, translate(col("text"), "aeiou", m))
      }
    spark.range(copies).withColumnRenamed("id", "copy")
      .crossJoin(base)
      .select(
        (col("doc_id") + col("copy") * span).as("doc_id"),
        mutated.as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  def tileEmbeddings(spark: SparkSession, sfDir: String, outDir: String, copies: Int): Long = {
    val base = Tables.embeddings(spark, sfDir)
    val span = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    spark.range(copies).withColumnRenamed("id", "copy")
      .crossJoin(base)
      .select(
        (col("vec_id") + col("copy") * span).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    copies * base.count()
  }

  /** Tile events with disjoint per-copy key/sequence spaces (user_id and
    * event_id offset per copy, timestamps unchanged): keys grow with the
    * data, so per-key as-of/interval work stays constant and total work
    * should scale ~linearly. `ts` round-trips as the epoch-nanos Long the
    * nanosAsLong read produced — Tables.events renames it identically on
    * re-read. */
  def tileEvents(spark: SparkSession, sfDir: String, outDir: String, copies: Int): Long = {
    val base = Tables.events(spark, sfDir).withColumnRenamed("ts_ns", "ts")
    val spans = base.agg(max(col("user_id")), max(col("event_id"))).head()
    val uspan = spans.getLong(0) + 1
    val espan = spans.getLong(1) + 1
    spark.range(copies).withColumnRenamed("id", "copy")
      .crossJoin(base)
      .select(
        (col("event_id") + col("copy") * espan).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * uspan).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    copies * base.count()
  }

  private def usedHeapMb(): Long = {
    System.gc(); System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.local("graft-scale-probe", cores = cores)
    val probes = Seq(
      "q_neardup_jaccard", "q_neardup_minhash", "q_neardup_simhash", "q_sim_topk_ivf",
      // round-7 operators: keyed time joins scale with keys (tiled
      // user spaces), text/vector pipelines with rows
      "q_asof_join", "q_range_join", "q_decontaminate", "q_chunk", "q_embed_centroid",
      // round-7 batch 2: explode-heavy LM counts, per-shard packing
      // window, bounded-collect centroid classification
      "q_bigrams", "q_pack", "q_knn_label",
      // round-7 batch 3: df-join + per-doc window, pure-projection quantize
      "q_rare_terms", "q_quantize",
      // round-7 batch 4: fingerprint anti-join, multi-distinct profile
      "q_dedup_incr", "q_report")

    val work = java.nio.file.Files.createTempDirectory("graft-scale")
    try {
      val oneDir = s"$work/x1"
      val bigDir = s"$work/x$copies"
      val n1 = tileDocuments(spark, sfDir, oneDir, 1)
      tileEmbeddings(spark, sfDir, oneDir, 1)
      tileEvents(spark, sfDir, oneDir, 1)
      val nBig = tileDocuments(spark, sfDir, bigDir, copies)
      tileEmbeddings(spark, sfDir, bigDir, copies)
      tileEvents(spark, sfDir, bigDir, copies)
      println(s"SCALEPROBE docs x1=$n1 x$copies=$nBig")

      def run(dir: String, name: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // one untimed warm pass at x1 (JIT, codegen cache)
      probes.foreach(run(oneDir, _))

      var failures = List.empty[String]
      probes.foreach { name =>
        val heap0 = usedHeapMb()
        val t1 = (1 to 2).map(_ => run(oneDir, name)).min
        val tBig = (1 to 2).map(_ => run(bigDir, name)).min
        val heap1 = usedHeapMb()
        val ratio = tBig / t1
        // "near-linear": ×copies data may cost up to 2× the linear
        // extrapolation (constant per-job overhead dominates the small
        // side, candidate/bucket growth the big side)
        val ok = ratio <= copies * 2.0
        // retained driver heap must not scale with the data: allow a
        // generous fixed slack for caches/metrics, never O(rows)
        val heapOk = heap1 - heap0 <= 1024
        if (!ok) failures ::= s"$name wall-time ratio $ratio > ${copies * 2.0}"
        if (!heapOk) failures ::= s"$name retained driver heap +${heap1 - heap0} MiB"
        println(f"SCALEPROBE $name%-20s x1=$t1%6.2f s  x$copies=$tBig%6.2f s  " +
          f"ratio=$ratio%5.2f (linear=$copies.0)  heap=$heap0%5d->$heap1%5d MiB")
      }
      if (failures.nonEmpty) {
        failures.foreach(f => println(s"SCALEPROBE FAIL $f"))
        sys.exit(2)
      }
      println("SCALEPROBE OK — near-linear growth, bounded driver heap")
    } finally {
      Replay.wipe(work)
      spark.stop()
    }
  }
}
