package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One more octave for the documented heaviest-growth exceptions
  * (round-14, verdict ask #5): the ×8-tier ScaleProbe leaves two rows
  * near or above its linear ceiling — q_profile's exact multi-distinct
  * Expand (7.30, just under 8.0-linear) and the FIXED-8-bucket
  * q_colocated_join (11.04, above it) — plus q_substring_dedup's
  * dup-table worst case. This main measures the ×8 → ×64 octave on
  * exactly those, so the 100 TB extrapolation rests on two measured
  * octaves instead of one:
  *
  *  - q_profile over lineitem tiled ×8 and ×64 (plain row tiling);
  *    linear = 8.0 between tiers. The exact path's growth POWER is
  *    what's being confirmed — the declared swap-in stays
  *    [[graft.ops.Relational.profileApprox]].
  *  - q_colocated_join at the declared FIXED 8-bucket layout ×8 vs
  *    ×64 (per-bucket sort O(n log n) at constant bucket count — the
  *    honest super-linearity), and beside it the production lever:
  *    buckets ∝ data (64 → 512, per-bucket volume constant), which
  *    must stay ≈ linear across this octave too.
  *  - q_substring_dedup over UNMUTATED tiled documents (every window
  *    a corpus-wide ×8/×64 repeat — the maximal dup table, harsher
  *    than the vowel-mutated tiling the ×8 probe uses): occurrence
  *    rows ∝ tokens, canonical agg ∝ distinct fingerprints (constant
  *    across tiers here), cuts ∝ docs — so the octave must be ≈
  *    linear if the shape claims hold.
  *
  * Round-15 additions:
  *  - q_subsume and q_neardup_dedup (the two heaviest declared
  *    near-dup pipelines) one octave up over ×64-decorrelated copies
  *    ([[tileDocumentsMutated]]) — candidate volume and component
  *    structure ∝ rows, label-propagation rounds bounded by component
  *    diameter.
  *  - the semantic-dedup centroid stage at k ∝ rows, flat vs
  *    hierarchical ([[graft.ops.NearDup.semanticDedupHier]]): the flat
  *    row is the measured rows·k wall (it cannot even train the
  *    prescribed k — the sample budget caps it), the hier row is the
  *    production lever and must hold its rows·√k model.
  *
  * Run (quiet machine, tmux — ~30-50 min):
  *   sbt "Test/runMain graft.Scale64 /root/testdata/sf0.1 32"
  */
object Scale64 {

  /** One document tiler, parameterized by the per-copy text expression
    * (doc_id offset per copy either way):
    *
    *  - EXACT duplicates (identity text) — the opposite of ScaleProbe's
    *    mutated tiling: maximal repetition, substring dedup's worst case.
    *  - DECORRELATED copies (every vowel replaced by a copy-tagged
    *    token `q<copy>`): any two copies share no vowel-bearing
    *    shingle, so cross-copy Jaccard ≈ 0 and near-dup candidate
    *    volume stays ∝ rows (ScaleProbe's vowel-map tiling does the
    *    same but tops out at 10 distinct maps; ×64 needs a generator).
    *    Partial decorrelation would be worse than none: copies at
    *    Jaccard ~0.5 collide in MinHash bands often enough to explode
    *    candidates quadratically without ever passing verify. */
  private def tileDocuments(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      copies: Int)(
      textExpr: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long = {
    val base = Tables.documents(spark, sfDir)
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    spark.range(copies).withColumnRenamed("id", "copy")
      .crossJoin(base)
      .select(
        (col("doc_id") + col("copy") * span).as("doc_id"),
        textExpr(col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  private def tileDocumentsDup(
      spark: SparkSession, sfDir: String, outDir: String, copies: Int): Long =
    tileDocuments(spark, sfDir, outDir, copies)(identity)

  private def tileDocumentsMutated(
      spark: SparkSession, sfDir: String, outDir: String, copies: Int): Long =
    tileDocuments(spark, sfDir, outDir, copies)(text =>
      when(col("copy") === 0, text)
        .otherwise(regexp_replace(
          text, lit("[aeiou]"), concat(lit("q"), col("copy").cast("string")))))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local("graft-scale64", cores = cores)
    val work = java.nio.file.Files.createTempDirectory("graft-scale64")
    val tiers = Seq(8, 64)
    def timeMin2(body: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      once() // warm (JIT, codegen, file listing)
      (1 to 2).map(_ => once()).min
    }
    var failures = List.empty[String]
    def octave(name: String, t8: Double, t64: Double, gate: Double): Unit = {
      val ratio = t64 / t8
      println(f"SCALE64 $name%-28s x8=$t8%7.2f s  x64=$t64%7.2f s  " +
        f"octave=$ratio%5.2f (linear=8.0)")
      if (ratio > gate) failures ::= f"$name octave $ratio%.2f > $gate%.1f"
    }

    try {
      tiers.foreach { c =>
        val d = s"$work/x$c"
        ScaleProbe.tileLineitem(spark, sfDir, d, c)
        ScaleProbe.tileOrders(spark, sfDir, d, c)
        tileDocumentsDup(spark, sfDir, d, c)
        ScaleProbe.tileEmbeddings(spark, sfDir, d, c)
        tileDocumentsMutated(spark, sfDir, s"$work/mut$c", c)
      }
      println(s"SCALE64 tiled x8 + x64 under $work")

      // ---- q_profile: exact multi-distinct Expand, one octave up.
      // The ×8 tier measured 2.82 (r10) / 7.30 (r13) vs ×1; a second
      // super-linear octave is EXPECTED — the gate only refuses a
      // blow-up past the distinct-driven n·|cols| Expand model (≤ 2×
      // the ×8-tier's own worst factor).
      def profile(dir: String): Unit =
        graft.ops.Relational.profile(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
          .write.format("noop").mode("overwrite").save()
      val p8 = timeMin2(profile(s"$work/x8"))
      val p64 = timeMin2(profile(s"$work/x64"))
      octave("q_profile(exact)", p8, p64, gate = 16.0)

      // ---- q_profile_approx: the declared 100 TB swap-in, as the
      // DECLARED checked surface (two aggregate scans joined — the HLL
      // pass at ×1 row volume PLUS the exact pass whose n_distinct the
      // audit needs; at true 100 TB the audit column comes off, leaving
      // the HLL scan alone). Round-16 addition (r15 verdict ask #6): the
      // only super-linear-TRENDING bench line had no second octave; the
      // r13→r15 drift adjudicated AMBIENT this round (PLANS.md), and
      // this row pins the growth POWER so a real regression can never
      // hide behind ambient noise again. Gate = the exact pass's own
      // gate: the checked surface cannot grow faster than its slowest
      // scan, and q_profile(exact) above measured 3.47 on this octave.
      def profileApprox(dir: String): Unit =
        graft.ops.Relational.profileApproxChecked(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
          .write.format("noop").mode("overwrite").save()
      val pa8 = timeMin2(profileApprox(s"$work/x8"))
      val pa64 = timeMin2(profileApprox(s"$work/x64"))
      octave("q_profile_approx(checked)", pa8, pa64, gate = 16.0)

      // ---- colocated join, fixed 8 buckets vs buckets ∝ data.
      def colocated(dir: String, buckets: Int, tag: String): Double = {
        val li = s"s64_li_$tag"
        val ord = s"s64_ord_$tag"
        graft.ops.Bucketed.writeBucketedTable(
          spark.read.parquet(s"$dir/lineitem.parquet")
            .select("l_orderkey", "l_extendedprice"),
          li, s"$work/buck_$tag/lineitem", "l_orderkey", buckets)
        graft.ops.Bucketed.writeBucketedTable(
          spark.read.parquet(s"$dir/orders.parquet")
            .select("o_orderkey", "o_orderpriority"),
          ord, s"$work/buck_$tag/orders", "o_orderkey", buckets)
        timeMin2 {
          graft.ops.Bucketed
            .colocatedJoin(spark, li, ord, "l_orderkey", "o_orderkey")
            .groupBy(col("o_orderpriority"))
            .agg(sum(col("l_extendedprice")).as("revenue"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      val cf8 = colocated(s"$work/x8", 8, "f8")
      val cf64 = colocated(s"$work/x64", 8, "f64")
      // fixed buckets: super-linear BY DESIGN and the penalty COMPOUNDS
      // (measured 25.35 on this octave vs ~11/8 = 1.4× over linear on
      // the first — per-bucket sort growth plus spill at 4.8M rows per
      // bucket). This row is the documented anti-pattern the scaled
      // row refutes; the gate only refuses a quadratic (≥ copies²)
      // blow-up, the number itself is the finding.
      octave("q_colocated(fixed-8)", cf8, cf64, gate = 64.0)
      val cs8 = colocated(s"$work/x8", 64, "s8")
      val cs64 = colocated(s"$work/x64", 512, "s64")
      // the lever: per-bucket volume constant → ≈ linear, same 2× slack
      // as ScaleProbe's linearity gate
      octave("q_colocated(scaled-buckets)", cs8, cs64, gate = 16.0)

      // ---- substring dedup, maximal dup table.
      def substr(dir: String): Unit =
        graft.ops.TextOps.substringDedup(
          spark.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "text", spanWords = 10)
          .write.format("noop").mode("overwrite").save()
      val s8 = timeMin2(substr(s"$work/x8"))
      val s64 = timeMin2(substr(s"$work/x64"))
      octave("q_substring_dedup(dup-max)", s8, s64, gate = 16.0)

      // ---- the two heaviest text/near-dup pipelines, one octave up over
      // DECORRELATED copies (cross-copy Jaccard ≈ 0, so candidate volume
      // and component structure stay ∝ rows — the regime the ×8 probe's
      // vowel-map tiling pins; this confirms the same shape holds ×64,
      // including q_neardup_dedup's label-propagation rounds, which must
      // stay bounded by component DIAMETER, not corpus size).
      def declared(name: String)(dir: String): Unit =
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      val sub8 = timeMin2(declared("q_subsume")(s"$work/mut8"))
      val sub64 = timeMin2(declared("q_subsume")(s"$work/mut64"))
      octave("q_subsume", sub8, sub64, gate = 16.0)
      val nd8 = timeMin2(declared("q_neardup_dedup")(s"$work/mut8"))
      val nd64 = timeMin2(declared("q_neardup_dedup")(s"$work/mut64"))
      octave("q_neardup_dedup", nd8, nd64, gate = 16.0)

      // ---- semantic-dedup centroid stage at k ∝ rows: flat vs
      // hierarchical. The pair/verify tail is bucket-volume-bound
      // (∝ rows at constant bucket size — ScaleProbe's q_semdedup row
      // covers it); what k ∝ rows changes is TRAIN (driver,
      // iters·sample·k·dim flat vs iters·sample·2√k·dim hier) and
      // ASSIGN (executor, rows·k·dim flat vs rows·3√k·dim hier at 2
      // probes), so that stage is what this adjudication times. The
      // flat row is the documented wall — it cannot even TRAIN the
      // prescribed k (the sample budget caps it at 4096) and its
      // assignment still grows ∝ rows·k; the gate only refuses a
      // beyond-quadratic blowup, the number itself is the finding. The
      // hier row is the production lever and must hold ≈ linear.
      def assignStage(dir: String, hier: Boolean): Unit = {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val rows = emb.count()
        val k = (rows / 250L).toInt
        val assigned =
          if (!hier) {
            val kCap = math.min(k, 4096)
            val cents = graft.ops.Similarity.trainCentroids(
              emb, "vec_id", "embedding", kCap, sampleSize = 4096)
            explode(graft.functions.native
              .nearestCentroids(col("embedding"), cents, 4))
          } else {
            val side = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
            val h = graft.ops.Similarity.trainCentroidsHier(
              emb, "vec_id", "embedding", side, side,
              sampleSize = math.min(4 * k, 32768))
            explode(graft.functions.native.nearestCentroidsHier(
              col("embedding"), h.coarse, h.fine, h.fineCell, 2, 4))
          }
        emb.select(assigned.as("bucket"))
          .write.format("noop").mode("overwrite").save()
      }
      // hier's exact model is rows·√k·dim — at k ∝ rows that is
      // rows^1.5 per octave ≤ 8·√8 ≈ 22.6 if assignment alone dominated
      // (a third level is the next lever at true 100 TB); the gate
      // refuses anything past that model + scan overhead slack
      val hf8 = timeMin2(assignStage(s"$work/x8", hier = true))
      val hf64 = timeMin2(assignStage(s"$work/x64", hier = true))
      octave("semdedup-assign(hier)", hf8, hf64, gate = 24.0)
      val ff8 = timeMin2(assignStage(s"$work/x8", hier = false))
      val ff64 = timeMin2(assignStage(s"$work/x64", hier = false))
      octave("semdedup-assign(flat)", ff8, ff64, gate = 64.0)

      if (failures.nonEmpty) failures.foreach(f => println(s"SCALE64 FAIL $f"))
      else println("SCALE64 OK")
    } finally {
      // cleanup must run even on gate failure (the x64 tiling is
      // gigabytes) — exit code is decided AFTER the finally
      try Replay.wipe(work) catch { case _: Exception => () }
      spark.stop()
    }
    if (failures.nonEmpty) sys.exit(1)
  }
}
