package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc probe: decompose the slowest bench queries into stages to find
  * where the time goes at sf0.1.
  * Run: sbt "Test/runMain graft.SlowQueryProbe /root/testdata/sf0.1"
  */
object SlowQueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val events = Tables.withTsMicros(Tables.events(spark, dir))
    val docs = Tables.documents(spark, dir)

    // warm-up
    time("warmup_events_scan")(events)
    time("warmup_docs_scan")(docs)

    // --- q_envelope_apply stages ---
    time("envelope_build")(graft.sources.Cdc.envelopeFromEvents(events))
    time("envelope_unwrap")(
      graft.sources.Cdc.unwrap(graft.sources.Cdc.envelopeFromEvents(events)))
    time("envelope_apply_full")(
      graft.sources.Cdc.applyEnvelope(graft.sources.Cdc.envelopeFromEvents(events), "user_id"))

    // --- q_neardup_winnow stages ---
    val fps = docs
      .select(col("doc_id").as("id"),
        graft.ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
      .select(col("id"), explode(col("__fp")).as("f"))
    time("winnow_fps_only")(fps)
    time("winnow_docfreq")(fps.groupBy(col("f")).agg(count(lit(1)).as("__df")))
    time("winnow_full")(graft.ops.NearDup.winnowPairs(docs, "doc_id", "text"))

    // --- q_neardup_embedding stages ---
    val emb = Tables.embeddings(spark, dir)
    time("emb_scan")(emb)
    val dim = graft.ops.Similarity.detectDim(emb, "embedding")
    val banded = emb.select(
      col("vec_id").as("id"),
      posexplode(graft.functions.native
        .hyperplaneSignatures(col("embedding"), 24, 4, dim, seed = 1000)))
      .toDF("id", "band", "sig")
    time("emb_banded_sigs")(banded)
    val cands = banded.select(col("band"), col("sig"), col("id").as("id1"))
      .join(banded.select(col("band"), col("sig"), col("id").as("id2")), Seq("band", "sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    time("emb_candidates")(cands)
    println("emb candidate count: " + cands.count())
    time("emb_full")(graft.ops.NearDup.embeddingNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.5, bands = 24, bitsPerBand = 4))

    // --- q_neardup_jaccard stages ---
    val sh = docs.select(col("doc_id").as("id"),
      explode(graft.ops.NearDup.shingles(col("text"), 3)).as("s"))
    time("jac_shingles")(sh)
    time("jac_full")(graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text"))

    // --- q_neardup_simhash stages (md5 now) ---
    time("simhash_hashes")(graft.ops.NearDup.simhashes(docs, "doc_id", "text"))
    time("simhash_full")(graft.ops.NearDup.simhashNearDupPairs(docs, "doc_id", "text"))

    // --- q_lang_id ---
    time("lang_id_full")(SparkEntry.queries("q_lang_id")(spark, dir))
    // --- q_window_session ---
    time("session_full")(SparkEntry.queries("q_window_session")(spark, dir))

    spark.stop()
  }
}
