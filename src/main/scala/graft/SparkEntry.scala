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

  /** Temp directory deleted recursively at JVM exit — the shared
    * hygiene of every per-(JVM, sf) cache below (bm25 postings,
    * bucketed-layout tables): nothing accumulates in /tmp across runs. */
  private def tempDirCleanedAtExit(prefix: String): String = {
    val path = java.nio.file.Files.createTempDirectory(prefix).toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      FsUtil.rmTree(new java.io.File(path))))
    path
  }

  private def bm25IndexFor(s: SparkSession, dir: String): String =
    bm25Indexes.computeIfAbsent(dir, { d =>
      val path = tempDirCleanedAtExit("graft-bm25-index")
      Search.writeBm25Index(
        Tables.documents(s, d), "doc_id", "text", path, buckets = Bm25IndexBuckets)
      path
    })

  /** Per-user/per-process path ([[Tables.mediaFixturePath]]) interpolated
    * into the q_media_dims oracle SQL, so writer and oracle always name
    * the same directory within a run and concurrent JVMs never race. */
  private val MediaFixturePath = Tables.mediaFixturePath

  /** One pair of bucketed tables per (JVM, sf) — the q_colocated_join
    * amortization model, same as the BM25 index: the bucket-layout
    * write (the pre-paid shuffle) happens once on first use; every
    * probe after it joins exchange-free. Table names carry an sf tag so
    * multi-sf runs don't collide in the session catalog; the data dirs
    * are temp and removed at JVM exit. */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def bucketedFor(s: SparkSession, dir: String): (String, String) = {
    val cached = bucketedCompute(s, dir)
    // REVALIDATE against this session's catalog: unlike the sibling
    // caches (which store on-disk paths), this one stores CATALOG
    // names, and a fresh SparkContext in the same JVM starts with an
    // empty catalog — stale names would fail the join with
    // TABLE_OR_VIEW_NOT_FOUND (r20 review finding)
    if (s.catalog.tableExists(cached._1) && s.catalog.tableExists(cached._2)) cached
    else {
      bucketedTables.remove(dir)
      bucketedCompute(s, dir)
    }
  }

  private def bucketedCompute(s: SparkSession, dir: String): (String, String) =
    bucketedTables.computeIfAbsent(dir, { d =>
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      // NOT under the `graft_` prefix: that is the PUBLIC namespace
      // Meta.listTables (q_show_tables) reports — an internal layout
      // table leaking into SHOW TABLES turned the meta query
      // catalog-order-dependent (caught by the driver-mimic compare)
      val li = s"bucketed_lineitem_$tag"
      val ord = s"bucketed_orders_$tag"
      val root = tempDirCleanedAtExit("graft-bucketed")
      // buckets ∝ rows (Bucketed.bucketsFor — sized from the larger
      // side, SAME count on both or co-location silently degrades):
      // the declared layout previously pinned 8 buckets at ANY sf, the
      // exact frozen-layout anti-pattern Bucketed's scaladoc warns
      // about and the roster's one super-linear scale shape (r17
      // ScaleProbe 5.05; ×64 octave 21.44 fixed vs 5.92 scaled).
      // Results never change with layout (BucketedJoinSpec pins it) —
      // only the plan does. The count() here reads parquet footers
      // only, paid once per (JVM, sf) alongside the layout write itself.
      val liRows = Tables.lineitem(s, d).count()
      val ordRows = Tables.orders(s, d).count()
      val buckets = ops.Bucketed.bucketsFor(math.max(liRows, ordRows))
      ops.Bucketed.writeBucketedTable(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
        li, s"$root/lineitem", "l_orderkey", buckets)
      ops.Bucketed.writeBucketedTable(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
        ord, s"$root/orders", "o_orderkey", buckets)
      (li, ord)
    })

  /** One persisted MinHash signature index per (JVM, sf) over the
    * q_neardup_incr history slice (doc_id % 10 != 0) — the same
    * amortization model as the BM25 postings: the history's signature
    * work is paid once; every probe prunes to its own (band, bucket)
    * partitions. */
  private val minhashIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def minhashIndexFor(s: SparkSession, dir: String): String =
    minhashIndexes.computeIfAbsent(dir, { d =>
      val path = tempDirCleanedAtExit("graft-minhash-index")
      NearDup.writeMinhashIndex(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", path)
      path
    })

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
        .orderBy(col("user_id").asc_nulls_last)),

    "q_changelog_apply" -> ((s, dir) =>
      Changelog
        .applyChangelog(
          Tables.withTsMicros(Tables.events(s, dir)),
          Seq("user_id"),
          col("event_id"),
          col("event_type") === "delete")
        .select("user_id", "event_id", "ts_us", "event_type", "value", "props")
        .orderBy(col("user_id").asc_nulls_last)),

    "q_envelope_apply" -> ((s, dir) => {
      // The full A2+A3+B1+B3+C2 path: Debezium-style envelope (with real
      // (key, NULL) tombstone records) → unwrap+__deleted rewrite → keyed
      // changelog apply. Must equal q_changelog_apply's state — same
      // events, same semantics, different wire representation.
      val env = graft.sources.Cdc.envelopeFromEvents(
        Tables.withTsMicros(Tables.events(s, dir)))
      graft.sources.Cdc.applyEnvelope(env, "user_id").orderBy(col("user_id").asc_nulls_last)
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
        .orderBy(col("event_type").asc_nulls_first, col("bucket").asc_nulls_first,
          col("gset"))),

    "q_topn_per_group" -> ((s, dir) =>
      Relational
        .topNPerGroup(
          Tables.withTsMicros(Tables.events(s, dir)),
          n = 3,
          partitionCols = Seq("event_type"),
          col("value").desc, col("event_id").asc)
        .select("event_type", "event_id", "ts_us", "value", "rank")
        .orderBy(col("event_type").asc_nulls_last, col("rank"))),

    "q_struct_key" -> ((s, dir) => {
      // Debezium-style STRUCT{ID} message key: build, then re-extract
      // (reference: README.md:40 — key is an Avro record, not a bare int).
      val keyed = Tables
        .events(s, dir)
        .select(struct(col("user_id").as("ID")).as("key"), col("event_type"))
      keyed
        .groupBy(col("event_type"))
        .agg(countDistinct(col("key.ID")).as("n_keys"))
        .orderBy(col("event_type").asc_nulls_last)
    }),

    "q_null_guard" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .filter(Relational.nullGuard(col("value")))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_valid"),
          Relational.exactSumDouble(col("value")).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_last)),

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
        .orderBy(col("window_start_sec").asc_nulls_last, col("event_type").asc_nulls_last)),

    "q_window_hop" -> ((s, dir) =>
      Windowing
        .hopNanos(
          Tables.events(s, dir),
          col("ts_ns"),
          widthSeconds = 7200,
          hopSeconds = 3600,
          dims = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("cnt")))
        .orderBy(col("window_start_sec").asc_nulls_last, col("event_type").asc_nulls_last)),

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
        .orderBy(col("user_id").asc_nulls_last, col("session_start_us"))),

    "q_window_quantiles" -> ((s, dir) =>
      // Latency-percentile observability: exact discrete p50/p95 of
      // value per 1 h tumbling window (non-null values, rank
      // arithmetic only — the q_quantiles contract with the window as
      // the group); quantilesStream is the sketch-state stream flavor.
      Windowing
        .windowQuantilesDisc(
          Tables.events(s, dir), col("ts_ns"), widthSeconds = 3600,
          valueCol = "value", ps = Seq(0.5, 0.95))
        // NULLS LAST: a NULL-ts event forms a real NULL-window group
        // (no ts filter above) — the nullable-ORDER-BY rule
        .orderBy(col("window_start_sec").asc_nulls_last)),

    "q_profile" -> ((s, dir) =>
      // Data-quality profiling: per-column n/nulls/exact-distinct/min/
      // max/exact-sum over the fact table's numeric columns in one scan.
      Relational.profile(
        Tables.lineitem(s, dir),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))),

    "q_profile_approx" -> ((s, dir) =>
      // The documented 100 TB swap-in for q_profile, promoted to its own
      // oracle row: approx_count_distinct (HLL++, rsd 1%) replaces the
      // Expand-shaped exact multi-distinct. Cross-engine HLL estimates
      // can't hash-match, so the declared OUTPUT is the exact stats plus
      // a `distinct_ok` bound check — the sketch estimate, computed
      // engine-side, must land within 5% of the exact count (vs the
      // oracle's literal TRUE). The exact count here is the sf-sized
      // verification yardstick (two scans joined — the one-pass combined
      // form is a measured 40x trap, see profileApproxChecked's doc);
      // the swap-in operator itself (Relational.profileApprox) never
      // computes it.
      Relational.profileApproxChecked(
        Tables.lineitem(s, dir),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"),
        rsd = 0.01)),

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

    "q_dsir" -> ((s, dir) =>
      // DSIR-style importance weighting: log p_target − log p_raw per doc
      // under two Laplace-smoothed unigram models (target = the English
      // slice, raw = the whole corpus), computed as NLL_raw − NLL_target
      // via two passes of the same unigram_nll kernel; kept = weight ≥ 0
      // is the deterministic threshold-gate flavor of the resample.
      TextOps.dsirWeights(
        Tables.documents(s, dir), "doc_id", "text",
        targetPred = col("lang") === "en", tau = 0.0)),

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
      // no final orderBy (r22): batch() sorts survivors by id below the
      // chunk explode, so the output is already globally (doc_id,
      // chunk_ix)-ordered — an orderBy here would range-sample the
      // exploded chunks and re-execute the whole gate→dedup pipeline a
      // second time (the r21 sort-first family's rationale;
      // IngestPipelineSpec pins the order)
      graft.streaming.IngestPipeline
        .batch(
          docs.filter(!col("source").isin(hist: _*)).drop("source"),
          docs.filter(col("source").isin(hist: _*)),
          graft.streaming.IngestPipeline.Config(
            outDir = "", checkpointDir = "",
            minTokens = 20L, maxTokens = 400L, maxPunctRatio = 0.05))
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
        .orderBy(col("lang").asc_nulls_last)),

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

    "q_semdedup" -> ((s, dir) =>
      // SemDeDup (Abbas et al. 2023): k-means-bucketed semantic dedup —
      // within-cluster exact-cosine pairs, component collapse keeping
      // min id. k=8 with nAssign=4 multi-assignment is grid-probed for
      // EXACT equality with the unbucketed collapse on the fixture's
      // near-random geometry (0/1/14 dup pairs at sf0.001/0.01/0.1;
      // nAssign=3 is the measured minimum at sf0.1, 4 adds margin —
      // clustered data needs 1, NearDupSpec). The oracle is the
      // all-pairs transitive-closure ground truth: full recall on the
      // fixture is part of the verified contract.
      NearDup.semanticDedup(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.5, nClusters = 8, nAssign = 4)),

    "q_doc_bytes" -> ((s, dir) =>
      // Multimodal plumbing over the only payloads the fixture offers:
      // text as opaque UTF-8 blobs → size + content digest metadata.
      // Sort LAST, not first (r22, reverting the r21 sort-first shape
      // per the verdict): sha256/length are trivially cheap, so paying
      // the range sampler's second kernel pass is better than carrying
      // the full text through the range exchange — the sorted rows are
      // ~70 bytes instead of the corpus (guide §2.3 shuffle fewer
      // bytes). r21's own A/B already read this query as a wash-to-
      // worse under sort-first.
      MultiModal
        .mediaMeta(MultiModal.docBlobs(Tables.documents(s, dir)), "bytes")
        .select(col("doc_id"), col("n_bytes"), col("content_sha"))
        .orderBy(col("doc_id"))),

    "q_media_dims" -> ((s, dir) => {
      // The media_dims AND av_meta kernels under the oracle gate: parse
      // pixel dimensions plus audio/video container metadata out of
      // every layout the kernels support, against expectations STORED
      // NEXT TO the bytes in a deterministic generated fixture (no
      // binary media table exists in the driver set —
      // Tables.mediaFixture). The oracle reads the same fixture file and
      // emits the stored expectations; a kernel mis-parse (or a NULL
      // where a figure exists) hash-mismatches.
      val media = s.read.parquet(mediaFixtureFor(s))
      MultiModal
        .withAvMeta(MultiModal.withDimensions(media, "bytes"), "bytes")
        .select(col("media_id"), col("width"), col("height"),
          col("av_container"), col("duration_ms"), col("sample_rate"),
          col("channels"), col("bit_depth"))
        .orderBy(col("media_id"))
    }),

    "q_quality" -> ((s, dir) =>
      // Sort LAST, not first (r22, reverting the r21 sort-first shape
      // per the verdict): the char-class kernel is cheap, so the
      // narrow feature rows sort instead of the text — see q_doc_bytes
      TextOps
        .qualityFeatures(
          Tables.documents(s, dir).select("doc_id", "text"), "text")
        .select(
          col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("punct_ratio"), col("upper_ratio"), col("mean_token_len"))
        .orderBy(col("doc_id"))),

    "q_gopher" -> ((s, dir) =>
      // The published Gopher pretraining-filter rule set: required-
      // stopword hits, alphabetic-token fraction, token-count and
      // mean-token-length bands, one composite pass verdict — pure
      // per-row projection, every float an IEEE division of exact ints.
      // minStopwordHits=1 (not the classic 2): the synthetic fixture's
      // vocab pool carries only 'the' from the required set, so 1 is
      // the threshold at which the verdict discriminates here (382/500
      // docs hit it, 55% sit in the token band).
      // input sorted first (the TextOps.unigramLmScore r21 note): the
      // gopher kernels project ABOVE the determinism sort, so the range
      // sampler never re-runs them; identical rows, identical order
      TextOps.gopherQuality(
        Tables.documents(s, dir).select("doc_id", "text").orderBy(col("doc_id")),
        "doc_id", "text", minStopwordHits = 1)),

    "q_quality_clf" -> ((s, dir) =>
      // Trained quality gate: Naive Bayes over quantized token-count
      // features, labels bootstrapped from the Gopher verdict on the
      // first-500-by-id sample, weights broadcast as a literal CASE
      // chain — training is a bounded driver-side count, scoring one
      // zero-shuffle codegen projection. Closed-form training is what
      // makes the learned scorer oracle-reproducible.
      TextOps.qualityClassifier(
        Tables.documents(s, dir), "doc_id", "text", sampleSize = 500)),

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

    "q_phrase" -> ((s, dir) =>
      // Positional phrase retrieval (the query bag-of-words BM25 can't
      // express): top-10 docs by occurrences of the consecutive-token
      // phrase "table hash" — one kernel-window filter per row +
      // TakeOrdered, zero shuffle, integer-exact ranking.
      Search.phraseTopK(
        Tables.documents(s, dir), "doc_id", "text",
        phrase = Seq("table", "hash"), k = 10)),

    "q_sim_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, dir),
        "vec_id",
        "embedding",
        queryId = 0L,
        k = 10)),

    "q_sim_topk_batch" -> ((s, dir) =>
      // Batched serving shape: three query vectors answered as a union
      // of per-query TakeOrdered heaps over the same corpus — nothing
      // shuffles proportional to the corpus; the determinism sort sees
      // queries x k rows. The index probes are the high-volume path.
      Similarity.bruteForceTopKBatch(
        Tables.embeddings(s, dir),
        "vec_id",
        "embedding",
        queryIds = Seq(0L, 1L, 2L),
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

    "q_source_cap" -> ((s, dir) =>
      // Mixture enforcement: at most 10 docs per source, picked by
      // deterministic hash order (the anti-domination quota a crawl
      // mixture needs) — narrow rank + semi-join, text never shuffles.
      TextOps.sourceCap(Tables.documents(s, dir), "doc_id", "source", cap = 10)
        .select("doc_id", "source")
        .orderBy(col("doc_id"))),

    "q_chunk" -> ((s, dir) =>
      // Context-window chunking: 32-token windows every 24 tokens (8-token
      // overlap), tail chunk included — pure explode, no shuffle beyond
      // the determinism sort. Input sorted first (the unigramLmScore r21
      // note): docs sort by doc_id BEFORE the chunk kernel + posexplode,
      // so the sampler never re-runs the kernel and the sort moves each
      // text once instead of every overlapping chunk; posexplode emits
      // chunk_ix ascending within each row, so the output order is the
      // same (doc_id, chunk_ix) total order the old trailing orderBy
      // produced (unique ids).
      TextOps
        .chunk(
          Tables.documents(s, dir).select("doc_id", "text").orderBy(col("doc_id")),
          "doc_id", "text", window = 32, stride = 24)),

    "q_paradup" -> ((s, dir) =>
      // Paragraph-level exact-substring dedup (Lee et al. 2021): 10-token
      // tiles, repeats survive only at the first (doc_id, tile_ix)
      // occurrence, doc text rebuilt from surviving tiles. Only 16-byte
      // tile fingerprints exchange; hot boilerplate tiles partially
      // aggregate map-side (min/count), never window-rank.
      TextOps.paragraphDedup(Tables.documents(s, dir), "doc_id", "text",
        tileWords = 10)),

    "q_substring_dedup" -> ((s, dir) =>
      // Span-level exact-substring dedup — Lee et al. 2021's actual
      // contract: ANY repeated >=10-token run is removed after its first
      // occurrence, including spans straddling q_paradup's tile grid.
      // Stride-1 window fingerprints (16-byte md5, rows ∝ tokens),
      // min-struct canonicals, one O(tokens+cuts) compiled rebuild.
      TextOps.substringDedup(Tables.documents(s, dir), "doc_id", "text",
        spanWords = 10)),

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
        .orderBy(col("label").asc_nulls_last, col("dim"))),

    "q_quantiles" -> ((s, dir) =>
      // Corpus length-distribution stats: exact discrete p50/p90/p99 of
      // n_chars per language — rank arithmetic only, engine-exact (no
      // interpolation blend); see Relational.groupQuantilesDisc.
      Relational
        .groupQuantilesDisc(
          Tables.documents(s, dir), "lang", "n_chars", Seq(0.5, 0.9, 0.99))
        .orderBy(col("lang").asc_nulls_last)),

    "q_quantiles_approx" -> ((s, dir) =>
      // The documented 100 TB swap-in for q_quantiles, promoted to its
      // own oracle row (the q_profile_approx pattern): the GK sketch
      // replaces the per-key window sort with one hash aggregate.
      // Cross-engine sketch values can't hash-match, so the declared
      // output is the exact quantiles plus approx_ok — every sketch
      // estimate must land within its rank guarantee of exact (vs the
      // oracle's literal TRUE). Exact here is the sf-sized yardstick;
      // the swap-in itself never computes it.
      Relational.groupQuantilesApproxChecked(
        Tables.documents(s, dir), "lang", "n_chars", Seq(0.5, 0.9, 0.99))),

    "q_bigrams" -> ((s, dir) =>
      // Word-bigram LM count head: top-50 word pairs — explode windows,
      // map-side-combined hash agg, TakeOrderedAndProject.
      TextOps.ngramCounts(Tables.documents(s, dir), "text", n = 2, topK = 50)),

    "q_source_mix" -> ((s, dir) =>
      // Mixture-weights table: per-source docs, tokens, and corpus token
      // share — the input to data-mixture decisions and sampling rates.
      TextOps.sourceMix(Tables.documents(s, dir), "source", "text")),

    "q_mix_rebalance" -> ((s, dir) =>
      // Measure → decide: per-source keep rates hitting target token
      // shares (src0 capped at 2% → downsampled; src1 targeted at 10%,
      // already below → kept whole; untargeted sources keep rate 1.0).
      // The output feeds deterministicSample directly.
      TextOps.mixRebalance(
        Tables.documents(s, dir), "source", "text",
        targets = Map("src0" -> 0.02, "src1" -> 0.10))),

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

    "q_corpus_diff" -> ((s, dir) => {
      // Snapshot audit: the previous corpus generation is derived
      // deterministically from documents (drop ids % 7 == 0 → those
      // read as added; vowel-case ids % 5 == 0 → changed; plus one
      // ghost row only the old side has → removed); diff it against
      // the current corpus by normalized-text fingerprint.
      val docs = Tables.documents(s, dir)
      val old = docs
        .filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 0, translate(col("text"), "ae", "AE"))
            .otherwise(col("text")).as("text"))
        .unionByName(
          s.range(1).select(lit(-1L).as("doc_id"), lit("ghost document").as("text")))
      TextOps.corpusDiff(old, docs, "doc_id", "text")
    }),

    "q_quantize" -> ((s, dir) =>
      // int8 embedding quantization: per-vector max-abs scale + rounded
      // codes — the 4x vector-store compression, engine-exact rounding.
      // Declared flattened to one row per (vec_id, i) — array cells break
      // the harness comparator's pandas row sort. Zero vectors (NULL
      // codes) drop in BOTH engines: posexplode and unnest each emit no
      // rows for a NULL array.
      // input sorted first (the unigramLmScore r21 note): the quantize
      // kernel projects above the sort and posexplode emits i ascending
      // within each row — the same (vec_id, i) total order as the old
      // trailing orderBy (unique vec_ids), with the kernel run once
      Similarity
        .quantizeInt8(
          Tables.embeddings(s, dir).select("vec_id", "embedding").orderBy(col("vec_id")),
          "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode(col("codes")).as(Seq("i", "code")))
        .select(col("vec_id"), col("scale"), col("i").cast("long").as("i"), col("code"))),

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
    }),

    // --- round 11: cross-tab / distribution / time-series / keyword ops --

    "q_pivot" -> ((s, dir) =>
      // Cross-tab: order value by priority × status, declared pivot
      // values (one scan, static schema — no distinct-values driver job).
      Relational.pivotAgg(
        Tables.orders(s, dir),
        "o_orderpriority", "o_orderstatus", Seq("F", "O", "P"),
        "o_totalprice")),

    "q_histogram" -> ((s, dir) =>
      // Fixed-width price histogram, empty buckets included — the
      // distribution profile a data-quality dashboard draws.
      Relational.histogram(
        Tables.lineitem(s, dir), "l_extendedprice",
        lo = 0.0, hi = 110000.0, n = 22)),

    "q_outliers" -> ((s, dir) =>
      // Per-type z-score anomalies over the event stream — exact-moment
      // arithmetic so both engines classify identically.
      Relational.zOutliers(
        Tables.events(s, dir), "event_type", "event_id", "value", z = 3.0)),

    "q_gap_fill" -> ((s, dir) =>
      // Per-user daily value series with gaps filled by carry-forward
      // (locf) — the time-series regularization step before any
      // windowed model sees the data.
      Windowing.gapFill(
        Tables.events(s, dir), "user_id", "ts_ns", "event_id", "value",
        stepNs = 86400000000000L)),

    "q_tfidf" -> ((s, dir) =>
      // Top-3 TF-IDF keywords per document (smooth idf, rounded score,
      // deterministic rank) — the log-weighted counterpart of
      // q_rare_terms' integer-exact idf ordering.
      TextOps.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)),

    "q_drift" -> ((s, dir) => {
      // Exact two-sample KS between deterministic corpus halves'
      // n_chars distributions — the drift gate between generations.
      val docs = Tables.documents(s, dir)
      Relational.ksDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0),
        "n_chars")
    }),

    "q_collocations" -> ((s, dir) =>
      // Top-50 PMI collocations (pair count >= 5) — the phrase-vocab /
      // corpus-analysis step; integer counts, rounded-ln score.
      TextOps.collocations(Tables.documents(s, dir), "text")),

    "q_gaps" -> ((s, dir) =>
      // Silence detection over history: every >2-day hole in a user's
      // event stream (stalled connector / dead device / churn signal);
      // GapAlertStream is the live dead-man's-switch flavor.
      EventAnalytics.gaps(
        Tables.events(s, dir), "user_id", "ts_ns", gapNs = 172800000000000L)),

    "q_colocated_join" -> ((s, dir) => {
      // Revenue by priority over PRE-BUCKETED fact tables: the join's
      // shuffle was paid once at table-build time (first use per JVM,
      // the bm25-index amortization model); the probe's plan carries no
      // exchange on either join side (BucketedJoinSpec pins it).
      val (li, ord) = bucketedFor(s, dir)
      ops.Bucketed.colocatedJoin(s, li, ord, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          Relational.exactSumDouble(col("l_extendedprice")).as("sum_base"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- round 12: bloom-gated dedup / robust stats / trailing windows --

    "q_dedup_bloom" -> ((s, dir) => {
      // Against-history dedup behind a Bloom pre-gate: history (doc_id %
      // 7 != 0) compresses to one ~76 KiB filter; batch rows the filter
      // rejects are definitely-new and skip the anti-join exchange
      // entirely. Output EQUALS the exact dedupAgainst at any filter
      // sizing — the oracle is the plain NOT EXISTS.
      val docs = Tables.documents(s, dir)
      TextOps
        .dedupAgainstBloom(
          docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(7)) === 0),
          "text", expectedItems = 1L << 16, fpp = 0.01)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "q_outliers_mad" -> ((s, dir) =>
      // Robust per-type anomalies: |value - median| > 3 x the median
      // absolute deviation — the outlier gate a heavy tail can't hide
      // from (the same rows' z-scores are dragged by the extremes that
      // are the outliers). Discrete-rank medians, IEEE-identical gate.
      Relational.madOutliers(
        Tables.events(s, dir), "event_type", "event_id", "value", k = 3.0)),

    "q_heavy_hitters" -> ((s, dir) =>
      // Key-skew audit: top-20 users by event count with share and
      // cumulative share of all events — the measurement behind every
      // salting / bucket-count decision in this repo.
      Relational.heavyHitters(Tables.events(s, dir), "user_id", topK = 20)),

    "q_rolling" -> ((s, dir) =>
      // Per-event trailing 7-day count/sum/avg of the user's values —
      // the value-RANGE window frame class (each event anchors its own
      // trail; tumbling buckets would split it).
      Windowing.rollingStats(
        Tables.events(s, dir), "user_id", "ts_ns", "event_id", "value",
        windowNs = 604800000000000L)),

    "q_neardup_incr" -> ((s, dir) => {
      // Incremental near-dup against the PERSISTED signature index: the
      // mod-10 batch probed for cross near-dups with history — the
      // history's signature work was paid once at index time (first use
      // per JVM, the bm25 amortization model).
      val docs = Tables.documents(s, dir)
      NearDup.probeMinhashIndex(
        minhashIndexFor(s, dir),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text")
    }),

    "q_entropy" -> ((s, dir) =>
      // Per-doc character entropy — the diversity gate (padding / spam /
      // uniform noise) next to the Gopher rules; one kernel pass, zero
      // shuffle.
      TextOps.charEntropyScores(Tables.documents(s, dir), "doc_id", "text")),

    "q_lm_score2" -> ((s, dir) =>
      // Interpolated-bigram perplexity — the order-2 LM gate: common
      // words in scrambled order pass the unigram model but scream
      // here. Two bounded-head trainings, one zero-shuffle scoring pass.
      TextOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")),

    "q_window_topk" -> ((s, dir) =>
      // Top-3 events by value per (hour x event type) — the leaderboard
      // query windowed aggregates can't answer (they keep no row
      // identity); deterministic (value desc, event_id) rank.
      Windowing.windowTopN(
        Tables.events(s, dir), "ts_ns", widthSeconds = 3600,
        dims = Seq("event_type"), valueCol = "value", seqCol = "event_id", k = 3)),

    "q_sample_weighted" -> ((s, dir) =>
      // Exactly 30 docs per language, longer docs proportionally more
      // likely (weight = n_chars) — sized weighted sampling without
      // replacement, deterministic under the md5 hash machinery.
      TextOps
        .weightedSample(Tables.documents(s, dir), "doc_id", "lang",
          weight = col("n_chars"), n = 30)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "q_scd2" -> ((s, dir) =>
      // SCD Type-2 history from the keyed changelog — every surviving
      // event versioned with [valid_from_seq, valid_to_seq) on the
      // offset axis; the is_current slice equals q_changelog_apply.
      Changelog
        .scd2(
          Tables.withTsMicros(Tables.events(s, dir)),
          Seq("user_id"), col("event_id"), col("event_type") === "delete")
        .select("user_id", "valid_from_seq", "valid_to_seq", "is_current",
          "ts_us", "event_type", "value", "props")
        .orderBy(col("user_id").asc_nulls_last, col("valid_from_seq"))),

    "q_transitions" -> ((s, dir) =>
      // First-order Markov matrix over per-user event-type sequences —
      // counts + conditional probabilities, exchange ∝ |types|².
      EventAnalytics.transitions(
        Tables.events(s, dir), "user_id", "ts_ns", "event_id", "event_type")),

    "q_chi2" -> ((s, dir) =>
      // Chi-squared independence of lang × source over the corpus —
      // the mixture audit; cardinality-bound after one cell count.
      Relational.chi2Independence(Tables.documents(s, dir), "lang", "source")),

    "q_psi" -> ((s, dir) => {
      // Population Stability Index between the q_drift corpus halves on
      // the q_histogram-style fixed grid — the calibrated drift gauge.
      val docs = Tables.documents(s, dir)
      Relational.psiDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0),
        "n_chars", lo = 0.0, hi = 600.0, n = 24)
    }),

    "q_rfm" -> ((s, dir) =>
      // Recency/Frequency/Monetary quintile segmentation per user —
      // one event-stream collapse, then user-axis ntile labeling.
      EventAnalytics.rfm(Tables.events(s, dir), "user_id", "ts_ns", "value")),

    "q_state_at" -> ((s, dir) =>
      // Point-in-time read over the SCD2 history: each key's version
      // valid when offset 5000 committed — the time-travel query the
      // history table exists to answer (== applyChangelog over the
      // seq<=5000 prefix, ChangelogSpec-pinned).
      Changelog
        .stateAt(
          Tables.withTsMicros(Tables.events(s, dir)),
          Seq("user_id"), col("event_id"), col("event_type") === "delete",
          atSeq = 5000L)
        .select("user_id", "valid_from_seq", "valid_to_seq",
          "ts_us", "event_type", "value", "props")
        .orderBy(col("user_id").asc_nulls_last, col("valid_from_seq"))),

    "q_kanon" -> ((s, dir) =>
      // k-anonymity audit at k=10 over the (lang, source) quasi-pair —
      // the pre-release privacy check; output ∝ risky combinations.
      Relational.kAnonymityAudit(
        Tables.documents(s, dir), Seq("lang", "source"), k = 10)),

    "q_disorder" -> ((s, dir) =>
      // Event-time disorder audit per user — the watermark-delay
      // measurement; the fixture's zero regressions is the finding
      // that lets event_id stand in for time order everywhere else.
      EventAnalytics.disorderAudit(
        Tables.events(s, dir), "user_id", "ts_ns", "event_id")),

    "q_neardup_edit" -> ((s, dir) =>
      // Edit-distance near-dup over 32-char prefixes (Levenshtein ≤ 2)
      // — PassJoin segment blocking, never all-pairs; the typo/near-
      // title modality shingle Jaccard misses.
      NearDup.editDistancePairs(
        Tables.documents(s, dir), "doc_id", "text", prefixLen = 32, maxDist = 2)),

    "q_cube" -> ((s, dir) =>
      // CUBE counts/sums over (event_type, user bucket) — every
      // dimension subset in one grouping-set aggregate (q_rollup keeps
      // only prefixes).
      Relational
        .cubeCounts(
          Tables.events(s, dir).withColumn("bucket", col("user_id") % 10),
          Seq("event_type", "bucket"),
          "value")
        .orderBy(col("event_type").asc_nulls_first, col("bucket").asc_nulls_first,
          col("gset"))),

    "q_moments" -> ((s, dir) =>
      // Per-language distribution shape of n_chars — exact-moment
      // skew/kurtosis; one aggregate, exchange ∝ groups.
      Relational.groupMoments(Tables.documents(s, dir), "lang", "n_chars")),

    "q_jsd" -> ((s, dir) =>
      // Pairwise Jensen–Shannon divergence between per-language
      // unigram distributions — the vocabulary-level corpus-similarity
      // matrix; exchange ∝ langs × vocab, output ∝ pairs.
      TextOps.jsdMatrix(Tables.documents(s, dir), "lang", "text")),

    "q_eval_langid" -> ((s, dir) =>
      // Per-class precision/recall/F1 of the language-ID gate against
      // the labeled lang — the model-eval report for a classifier the
      // pipeline trusts; everything after one cell count is ∝ classes.
      Relational.classificationReport(
        Tables.documents(s, dir)
          .select(col("lang"), TextOps.languageId(col("text")).as("lang_pred")),
        "lang", "lang_pred")),

    "q_langid_clf" -> ((s, dir) =>
      // Trained char-trigram NB language ID on the q_eval_langid
      // surface: counting-only training over a bounded sample,
      // zero-shuffle reference-object scoring, report cells ∝ classes².
      TextOps.langIdClassifier(Tables.documents(s, dir), "doc_id", "text",
        "lang", sampleSize = 500, topK = 512, n = 3)),

    "q_boilerplate" -> ((s, dir) =>
      // Top shared word-3-grams by DOCUMENT frequency (df ≥ 5) — the
      // boilerplate-discovery audit that sizes every df stop-filter;
      // per-doc array_distinct dedups map-side, exchange ∝ grams.
      TextOps.boilerplateNgrams(
        Tables.documents(s, dir), "text", n = 3, minDf = 5, topK = 50)),

    "q_heavy_hitters_approx" -> ((s, dir) =>
      // q_heavy_hitters with the Misra–Gries swap-in audited live:
      // exact top-20 plus sketch_ok booleans the MG theorems make
      // deterministically true (raw merge-order-dependent estimates
      // never reach the output — the profileApproxChecked posture).
      Relational.heavyHittersChecked(
        Tables.events(s, dir), "user_id", topK = 20, capacity = 64))
  )

  /** DuckDB-equivalent SQL per query key (same parquet tables, same column
    * names, same ORDER BY) — EVERY declared query has one as of round 4.
    * The hash-pipeline oracles (simhash/winnow) replicate the kernels as
    * exact integer arithmetic; they assume the fixture's ASCII corpus
    * (DuckDB indexes codepoints where the kernels index UTF-16 units, and
    * RE2 `\s` excludes `\v`) — a non-ASCII fixture would need
    * codepoint-aligned kernels first. Entries live in the per-family
    * [[OracleSqlRelational]] / [[OracleSqlSimilarity]] objects (a pure
    * mechanical split to keep each file reviewable).
    */
  def oracleSql: Map[String, String] =
    OracleSqlRelational.entries ++ OracleSqlSimilarity.entries
}
