package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TextOps

/** The training-data INGEST pipeline as ONE deployable call — the
  * LLM-corpus analog of [[ReplicationPipeline]] (the reference's CDC
  * deployable unit): arriving documents are quality-gated, deduped
  * against the historical corpus AND within the stream, chunked into
  * context windows, and appended exactly-once to a parquet corpus.
  *
  * Stage shapes (all established by their batch/stream counterparts):
  *  - quality gates: pure per-row kernel projections
  *    ([[graft.ops.TextOps.qualityFeatures]] — no shuffle, no state);
  *  - against-history dedup: stream-static anti-join on distinct
  *    16-byte fingerprints ([[DedupStream.dedupAgainstHistory]]);
  *  - within-stream dedup: first-arrival-wins `dropDuplicates` state,
  *    16 bytes per distinct doc ([[DedupStream.dedup]] — the unbounded
  *    TABLE regime; swap in the within-watermark flavor when bounded
  *    state matters more than long-range exactness);
  *  - chunking: per-row `word_chunks` kernel explode
  *    ([[graft.ops.TextOps.chunk]]);
  *  - sink: streaming parquet append — exactly-once via the sink's
  *    commit log, the corpus directory is readable mid-stream.
  *
  * Measured (ScaleProbe, sf0.1 ×8 tiling): 1.86 at ×8 on the r10 run
  * (q_ingest, the batch-replay flavor); the r13 bench pins its steady
  * wall at ~1.1 s after the r12 ambient-load artifact was re-measured.
  */
object IngestPipeline {

  /** `outDir`/`checkpointDir` are required; gates default to pass-all.
    * `partitionBy` names PASSTHROUGH columns (e.g. a language column)
    * to directory-partition the corpus by — downstream per-language
    * reads then partition-prune instead of scanning everything. */
  case class Config(
      outDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Long = 1L,
      maxTokens: Long = Long.MaxValue,
      maxPunctRatio: Double = 1.0,
      chunkWindow: Int = 32,
      chunkStride: Int = 24,
      partitionBy: Seq[String] = Nil,
      // optional scrub: rules applied to textCol BEFORE dedup/chunking,
      // so the corpus ships redacted and docs differing only in PII
      // dedup together ([[TextOps.redact]]; Nil = off)
      redactRules: Seq[TextOps.RedactRule] = Nil,
      // optional perplexity gate: a unigram LM trained OUTSIDE the
      // pipeline (usually on the trusted history corpus) — scoring is a
      // stateless projection, so the gate works identically in the
      // batch and streaming flavors (None = off)
      lm: Option[TextOps.UnigramLm] = None,
      maxAvgNll: Double = Double.MaxValue,
      // optional DSIR gate ([[TextOps.dsirWeights]] algebra): keep docs
      // whose importance weight NLL_raw − NLL_target clears the floor,
      // under (target, raw) models trained OUTSIDE the pipeline (target
      // on the domain you want more of, raw on the crawl). A stateless
      // projection like the perplexity gate, so batch and stream gate
      // identically (None = off)
      dsir: Option[(TextOps.UnigramLm, TextOps.UnigramLm)] = None,
      minDsirWeight: Double = Double.MinValue)

  /** The whole adopter path from FILES: JSONL documents dropped under
    * `inDir` flow through quarantine → gates → dedup → chunking into the
    * parquet corpus, while malformed lines land as raw text under
    * `quarantineDir`. Two queries over the file stream (the corpus path
    * is stateful — within-stream dedup — so the quarantine fork cannot
    * share its plan); the quarantine query is a cheap parse+filter.
    * Returns (corpus query, quarantine query). */
  def runFromJsonl(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      history: DataFrame,
      cfg: Config,
      quarantineDir: String,
      quarantineCheckpointDir: String): (StreamingQuery, StreamingQuery) = {
    val parsed = graft.sources.CorpusSource.readJsonlStream(spark, inDir, schema)
    val corpus = run(
      parsed.filter(col("quarantined_raw").isNull).drop("quarantined_raw"),
      history, cfg)
    val quarantine = parsed
      .filter(col("quarantined_raw").isNotNull)
      .select(col("quarantined_raw").as("raw"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", quarantineCheckpointDir)
      .format("parquet")
      .option("path", quarantineDir)
      .start()
    (corpus, quarantine)
  }

  /** Quality gate shared by the streaming and batch flavors.
    * qualityFeatures writes its feature columns with withColumn — an
    * input that already carries one of those names would be silently
    * OVERWRITTEN by the computed feature and then passed through under
    * the original name. Reject the collision instead of mis-gating. */
  private def gate(docs0: DataFrame, cfg: Config): DataFrame = {
    val featureCols =
      Set("n_chars", "n_tokens", "punct_ratio", "upper_ratio", "mean_token_len")
    val clash = docs0.columns.filter(featureCols.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with quality-gate feature names; " +
        "rename them before ingest")
    // scrub first: the redacted text is what gets gated, deduped,
    // chunked, and shipped (stateless projection — stream-safe)
    val docs =
      if (cfg.redactRules.isEmpty) docs0
      else {
        val out = docs0.columns.map {
          case c if c == cfg.textCol => col("__redacted").as(cfg.textCol)
          case c => col(c)
        }
        TextOps.redact(docs0, cfg.textCol, cfg.redactRules, "__redacted").select(out: _*)
      }
    val passthrough = docs.columns.map(col)
    val gated = TextOps
      .qualityFeatures(docs, cfg.textCol)
      .filter(
        col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
          col("punct_ratio") <= cfg.maxPunctRatio)
      .select(passthrough: _*)
    // perplexity gate (stateless projection): NULL scores — empty docs —
    // fail the predicate and drop, consistent with minTokens >= 1
    val ppl = cfg.lm match {
      case Some(lm) => gated.filter(lm.avgNll(col(cfg.textCol)) <= cfg.maxAvgNll)
      case None => gated
    }
    // DSIR gate (stateless projection): empty docs weigh exactly 0.0 and
    // pass iff the floor is ≤ 0 — but minTokens >= 1 drops them upstream
    cfg.dsir match {
      case Some((target, raw)) =>
        ppl.filter(
          (raw.nll(col(cfg.textCol)) - target.nll(col(cfg.textCol))) >= cfg.minDsirWeight)
      case None => ppl
    }
  }

  /** Batch-equivalent of [[run]]: the same gate → against-history dedup →
    * within-batch dedup → chunk stages over a static document frame.
    * This is the backfill/declared-query flavor (and the oracle-checkable
    * one): where the stream keeps the FIRST arrival of each normalized
    * text, the batch — which has no arrival order — keeps the LOWEST id;
    * on an id-ordered replay the two agree row-for-row
    * (IngestPipelineSpec pins that equivalence). `cfg.outDir` /
    * `cfg.checkpointDir` are unused here — there is no sink; the caller
    * owns the result.
    *
    * Scale shape: every stage is the already-audited batch operator —
    * one kernel pass for the gates (no shuffle), history reduced to
    * distinct 16-byte fingerprints before a broadcast-able anti-join
    * ([[TextOps.dedupAgainst]]), a fingerprint-keyed hash aggregate for
    * the within-batch dedup (16-byte keys, text carried once per
    * survivor), then the zero-shuffle chunk explode. */
  /** History is compared by its REDACTED text whenever redactRules are
    * set: incoming docs are scrubbed before the anti-join, so a raw
    * history (the natural input — the corpus as it was ingested, or any
    * external do-not-reingest list) whose rows contain PII would
    * otherwise never match their scrubbed incoming twins and be
    * silently re-ingested. Scrubbing is idempotent on already-redacted
    * text (the replacement tokens don't re-match the rules), so a
    * history that is this pipeline's own output passes through
    * unchanged. */
  private def comparableHistory(history: DataFrame, cfg: Config): DataFrame =
    if (cfg.redactRules.isEmpty) history
    else TextOps.redact(history, cfg.textCol, cfg.redactRules, "__redacted")
      .select(col("__redacted").as(cfg.textCol))

  def batch(incoming: DataFrame, history: DataFrame, cfg: Config): DataFrame = {
    // partitionBy carry columns survive the dedup (each carried from
    // the kept lowest-id row — the same row the text comes from) and
    // ride into the chunks exactly like run()'s: the batch flavor
    // previously dropped them at the groupBy, so a partitioned corpus
    // could not be backfilled batch-equivalently (r20 review finding)
    val carry = cfg.partitionBy
    val aggs =
      graft.functions.LatestRow
        .earliestRow(col(cfg.textCol), col(cfg.idCol)).as(cfg.textCol) +:
        carry.map(c => graft.functions.LatestRow
          .earliestRow(col(c), col(cfg.idCol)).as(c))
    val fresh = TextOps
      .dedupAgainst(comparableHistory(history, cfg), gate(incoming, cfg), cfg.textCol)
      .groupBy(TextOps.fingerprint(col(cfg.textCol)).as("__fp"))
      .agg(min(col(cfg.idCol)).as(cfg.idCol), aggs: _*)
      .select((cfg.idCol +: cfg.textCol +: carry).map(col): _*)
    // Determinism sort BELOW the chunk explode (r22, the sort-first
    // shape of the r21 per-doc kernel family): the survivors sort by id
    // (one row per doc) and the explode emits chunk_ix ascending above
    // the range exchange, so the output is globally (id, chunk_ix)-
    // ordered WITHOUT a final sort over the exploded chunks — a
    // caller's orderBy there would make the range sampler re-execute
    // the whole gate→dedup pipeline a second time (guide §1.2).
    // IngestPipelineSpec pins the output order.
    TextOps.chunk(
      fresh.orderBy(col(cfg.idCol)), cfg.idCol, cfg.textCol,
      cfg.chunkWindow, cfg.chunkStride, carryCols = carry)
  }

  /** Start the pipeline on an arriving document stream; `history` is the
    * static corpus whose texts must not be re-ingested. Output rows:
    * `(idCol, chunk_ix, chunk_text, n_tokens)`. */
  def run(stream: DataFrame, history: DataFrame, cfg: Config): StreamingQuery = {
    val gated = gate(stream, cfg)
    // within-stream dedup keys on the NORMALIZED fingerprint, exactly
    // like the against-history stage and the batch replay — the raw-md5
    // key let whitespace variants of one doc both ship (r20 review
    // finding; batch() keeps one, so stream==batch demanded this)
    val fresh = DedupStream.dedupBy(
      DedupStream.dedupAgainstHistory(gated, comparableHistory(history, cfg), cfg.textCol),
      TextOps.fingerprint(col(cfg.textCol)))
    val chunks = TextOps.chunk(
      fresh, cfg.idCol, cfg.textCol, cfg.chunkWindow, cfg.chunkStride,
      carryCols = cfg.partitionBy)
    val writer = chunks.writeStream
      .outputMode("append")
      .option("checkpointLocation", cfg.checkpointDir)
      .format("parquet")
      .option("path", cfg.outDir)
    (if (cfg.partitionBy.isEmpty) writer else writer.partitionBy(cfg.partitionBy: _*))
      .start()
  }
}
