package graft

/** DuckDB oracle SQL — relational pull/agg, changelog, windowing, event
  * analytics, profiling, and per-document text family (SparkEntry's
  * declared-query contract, split per-family for reviewability; see
  * [[SparkEntry.oracleSql]] for the conventions all entries follow).
  */
private[graft] object OracleSqlRelational {

  def entries: Map[String, String] = Map(
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
        |WHERE rn = 1 ORDER BY user_id ASC NULLS LAST""".stripMargin,

    "q_changelog_apply" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'delete' ORDER BY user_id ASC NULLS LAST""".stripMargin,

    "q_envelope_apply" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'delete' ORDER BY user_id ASC NULLS LAST""".stripMargin,

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
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS LAST""".stripMargin,

    "q_rollup" ->
      """SELECT event_type, (user_id % 10) AS bucket, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        |       CAST(GROUPING(event_type, (user_id % 10)) AS BIGINT) AS gset
        |FROM events
        |GROUP BY ROLLUP (event_type, (user_id % 10))
        |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST, gset""".stripMargin,

    "q_topn_per_group" ->
      """SELECT event_type, event_id, epoch_us(ts) AS ts_us, value, rank
        |FROM (SELECT event_type, event_id, ts, value,
        |             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
        |      FROM events) t
        |WHERE rank <= 3 ORDER BY event_type ASC NULLS LAST, rank""".stripMargin,

    "q_struct_key" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_keys
        |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS LAST""".stripMargin,

    "q_null_guard" ->
      """SELECT event_type, COUNT(*) AS n_valid,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY event_type ORDER BY event_type ASC NULLS LAST""".stripMargin,

    "q_window_tumble" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_sec,
        |       event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1 NULLS LAST, 2 NULLS LAST""".stripMargin,

    // Same integer nanos bucketing as q_window_tumble; finite-only
    // values rank (NaN/NULL desc orderings differ across engines) with
    // the deterministic (value DESC, event_id) tie-break.
    "q_window_topk" ->
      """WITH r AS (
        |  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_sec,
        |         event_type, event_id, value::DOUBLE AS value,
        |         ROW_NUMBER() OVER (
        |           PARTITION BY (epoch_ns(ts) // 3600000000000), event_type
        |           ORDER BY value::DOUBLE DESC, event_id ASC) AS "rank"
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND isfinite(value))
        |SELECT window_start_sec, event_type, "rank", event_id, value
        |FROM r WHERE "rank" <= 3
        |ORDER BY window_start_sec, event_type ASC NULLS LAST, "rank"""".stripMargin,

    // Same integer nanos bucketing as q_window_tumble, same discrete
    // rank arithmetic as q_quantiles, non-null values on both sides.
    "q_window_quantiles" ->
      """WITH r AS (
        |  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start_sec, value,
        |         ROW_NUMBER() OVER (PARTITION BY (epoch_ns(ts) // 3600000000000)
        |                            ORDER BY value) AS rk,
        |         COUNT(*) OVER (PARTITION BY (epoch_ns(ts) // 3600000000000)) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT window_start_sec,
        |       MAX(CASE WHEN rk = floor(0.5 * (n - 1)) + 1 THEN value END) AS p50,
        |       MAX(CASE WHEN rk = floor(0.95 * (n - 1)) + 1 THEN value END) AS p95
        |FROM r GROUP BY window_start_sec ORDER BY window_start_sec NULLS LAST""".stripMargin,

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
      // the non-null predicate mirrors the engine's funnel guard
      // (EventAnalytics drops NULL user/ts/event_id rows) so the pair
      // agrees by construction, not by fixture luck
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
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
      // non-null guard mirrored from the engine fold — see q_funnel
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
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
        |GROUP BY 1, 2 ORDER BY 1, 2 NULLS LAST""".stripMargin,

    "q_window_session" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM o)
        |SELECT user_id, MIN(epoch_us(ts)) AS session_start_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY user_id ASC NULLS LAST, session_start_us""".stripMargin,

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
        |FROM documents GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin,

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
        |       CASE WHEN n_tokens > 0 THEN round(exp(nll / CAST(n_tokens AS DOUBLE)), 6) END AS ppl
        |FROM score ORDER BY doc_id""".stripMargin,

    // Interpolated-bigram fold: position 1 is the q_lm_score unigram
    // term; positions ≥ 2 are one branch-free interpolation
    // `0.75·pb + 0.25·pu` with every denominator left-associated exactly
    // as the kernel computes it — identical double stream, summed in
    // token order (list_sum over range is the proven pattern). |V|
    // figures over the KEPT heads, matching truncation semantics.
    "q_lm_score2" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(
        |           string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |           x -> x <> '') AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT term, count(*) AS c
        |  FROM (SELECT unnest(t) AS term FROM toks)
        |  GROUP BY term ORDER BY c DESC, term LIMIT 65536),
        |mu AS (
        |  SELECT map(list(term ORDER BY term), list(c ORDER BY term)) AS lmu,
        |         CAST(sum(c) AS DOUBLE) AS total_u,
        |         CAST(count(*) AS DOUBLE) AS vu
        |  FROM vocab),
        |big AS (
        |  SELECT gram, count(*) AS c FROM (
        |    SELECT t[i] || ' ' || t[i+1] AS gram
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks))
        |  GROUP BY gram ORDER BY c DESC, gram LIMIT 65536),
        |mb AS (
        |  SELECT map(list(gram ORDER BY gram), list(c ORDER BY gram)) AS lmb,
        |         CAST(count(*) AS DOUBLE) AS vb
        |  FROM big),
        |score AS (
        |  SELECT doc_id,
        |         CAST(len(t) AS BIGINT) AS n_tokens,
        |         list_sum(list_transform(range(1, len(t)+1), i ->
        |           CASE WHEN i = 1 THEN
        |             -ln((CAST(coalesce(list_extract(map_extract(lmu, t[1]), 1), 0) AS DOUBLE) + 1.0)
        |                 / (total_u + vu + 1.0))
        |           ELSE
        |             -ln(0.75 * ((CAST(coalesce(list_extract(map_extract(lmb, t[i-1] || ' ' || t[i]), 1), 0) AS DOUBLE) + 1.0)
        |                         / (CAST(coalesce(list_extract(map_extract(lmu, t[i-1]), 1), 0) AS DOUBLE) + vb + 1.0))
        |                 + 0.25 * ((CAST(coalesce(list_extract(map_extract(lmu, t[i]), 1), 0) AS DOUBLE) + 1.0)
        |                           / (total_u + vu + 1.0)))
        |           END)) AS nll
        |  FROM toks, mu, mb)
        |SELECT doc_id, n_tokens,
        |       CASE WHEN n_tokens > 0 THEN nll / CAST(n_tokens AS DOUBLE) END AS avg_nll,
        |       CASE WHEN n_tokens > 0 THEN round(exp(nll / CAST(n_tokens AS DOUBLE)), 6) END AS ppl
        |FROM score ORDER BY doc_id""".stripMargin,

    // DSIR importance weight = NLL_raw − NLL_target: TWO of the
    // q_lm_score folds (target model over the English slice, raw model
    // over the whole corpus — same Laplace arithmetic, same token-order
    // list_sum), one IEEE subtraction; empty docs coalesce to 0.0
    // exactly like the engine's empty fold.
    "q_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |vt AS (
        |  SELECT term, count(*) AS c
        |  FROM (SELECT unnest(t) AS term FROM toks WHERE lang = 'en')
        |  WHERE term <> '' GROUP BY term
        |  ORDER BY c DESC, term LIMIT 65536),
        |mt AS (
        |  SELECT map(list(term ORDER BY term), list(c ORDER BY term)) AS lm_t,
        |         CAST(sum(c) AS DOUBLE) AS total_t,
        |         CAST(count(*) AS DOUBLE) AS vsize_t
        |  FROM vt),
        |vr AS (
        |  SELECT term, count(*) AS c
        |  FROM (SELECT unnest(t) AS term FROM toks)
        |  WHERE term <> '' GROUP BY term
        |  ORDER BY c DESC, term LIMIT 65536),
        |mr AS (
        |  SELECT map(list(term ORDER BY term), list(c ORDER BY term)) AS lm_r,
        |         CAST(sum(c) AS DOUBLE) AS total_r,
        |         CAST(count(*) AS DOUBLE) AS vsize_r
        |  FROM vr),
        |score AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(t, x -> x <> '')) AS BIGINT) AS n_tokens,
        |         coalesce(list_sum(list_transform(list_filter(t, x -> x <> ''),
        |           x -> -ln((CAST(coalesce(list_extract(map_extract(lm_r, x), 1), 0) AS DOUBLE) + 1.0)
        |                    / (total_r + vsize_r + 1.0)))), 0.0)
        |         - coalesce(list_sum(list_transform(list_filter(t, x -> x <> ''),
        |           x -> -ln((CAST(coalesce(list_extract(map_extract(lm_t, x), 1), 0) AS DOUBLE) + 1.0)
        |                    / (total_t + vsize_t + 1.0)))), 0.0) AS weight
        |  FROM toks, mt, mr)
        |SELECT doc_id, n_tokens, weight, weight >= 0.0 AS kept
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

    // the fixture stores the expected dims AND av-container figures next
    // to the bytes; the engine side must re-derive them from the bytes
    // alone (media_dims + av_meta kernels)
    "q_media_dims" ->
      s"""SELECT media_id, expected_width AS width, expected_height AS height,
         |       expected_container AS av_container,
         |       expected_duration_ms AS duration_ms,
         |       expected_sample_rate AS sample_rate,
         |       expected_channels AS channels,
         |       expected_bit_depth AS bit_depth
         |FROM read_parquet('${Tables.mediaFixturePath}/*.parquet')
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
        |            ELSE length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) * 1.0 / len(regexp_extract_all(text, '\S+'))
        |       END AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same tokenization, whitespace-strip mean-length (the RE2 \s ASCII
    // class, mirrored by the engine's charClassCounts class 2), and
    // required-stopword set as TextOps.gopherQuality; every float is one
    // IEEE division of exact integer counts, the verdict the same band
    // arithmetic.
    // Naive-Bayes quality classifier: the q_gopher feature/label
    // expressions (pairing proven there), integer/one-division bucket
    // quantization (bit-identical across engines), Laplace-smoothed
    // count parameters from the first-500-by-id sample, and the same
    // left-associated prior + per-feature ln-ratio sum the engine bakes
    // into its CASE chain. Score rounded to 6 decimals on BOTH sides
    // (ln is not correctly rounded); the pass verdict reads the ROUNDED
    // score. A doc whose bucket never occurred in the sample misses the
    // weight join → coalesce(c, 0) reproduces the engine's unseen-bucket
    // smoothing.
    "q_quality_clf" ->
      // NULL text is excluded from training and scoring alike (the
      // engine's gopherQuality has no verdict for it)
      """WITH t AS (
        |  SELECT doc_id, text,
        |         string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w,
        |         len(regexp_extract_all(text, '\S+')) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |         CASE WHEN n_tokens = 0 THEN 0.0
        |              ELSE length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) * 1.0 / n_tokens
        |         END AS mean_token_len,
        |         len(list_distinct(list_filter(w,
        |           x -> x IN ('the','be','to','of','and','that','have','with')))) AS n_stopword_hits,
        |         CASE WHEN n_tokens = 0 THEN 0.0
        |              ELSE len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0 / n_tokens
        |         END AS alpha_fraction
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |         least(n_tokens // 32, 7) AS f_len,
        |         least(CAST(floor(mean_token_len) AS BIGINT), 12) AS f_mtl,
        |         CAST(n_stopword_hits AS BIGINT) AS f_stop,
        |         least(CAST(floor(alpha_fraction * 10) AS BIGINT), 9) AS f_alpha,
        |         (n_tokens BETWEEN 50 AND 100000
        |          AND mean_token_len BETWEEN 3.0 AND 10.0
        |          AND n_stopword_hits >= 1
        |          AND alpha_fraction >= 0.8) AS y
        |  FROM s),
        |samp AS (
        |  SELECT * FROM f
        |  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 500)),
        |pri AS (
        |  SELECT count(*) FILTER (WHERE y) AS n1,
        |         count(*) FILTER (WHERE NOT y) AS n0 FROM samp),
        |wlen AS (SELECT f_len AS v, count(*) FILTER (WHERE y) AS c1,
        |                count(*) FILTER (WHERE NOT y) AS c0 FROM samp GROUP BY 1),
        |wmtl AS (SELECT f_mtl AS v, count(*) FILTER (WHERE y) AS c1,
        |                count(*) FILTER (WHERE NOT y) AS c0 FROM samp GROUP BY 1),
        |wstop AS (SELECT f_stop AS v, count(*) FILTER (WHERE y) AS c1,
        |                 count(*) FILTER (WHERE NOT y) AS c0 FROM samp GROUP BY 1),
        |walpha AS (SELECT f_alpha AS v, count(*) FILTER (WHERE y) AS c1,
        |                  count(*) FILTER (WHERE NOT y) AS c0 FROM samp GROUP BY 1),
        |scored AS (
        |  SELECT f.doc_id,
        |         round(
        |           ln((n1 + 1.0) / (n0 + 1.0))
        |           + (ln((coalesce(wlen.c1, 0) + 1.0) / (n1 + 8.0))
        |              - ln((coalesce(wlen.c0, 0) + 1.0) / (n0 + 8.0)))
        |           + (ln((coalesce(wmtl.c1, 0) + 1.0) / (n1 + 13.0))
        |              - ln((coalesce(wmtl.c0, 0) + 1.0) / (n0 + 13.0)))
        |           + (ln((coalesce(wstop.c1, 0) + 1.0) / (n1 + 9.0))
        |              - ln((coalesce(wstop.c0, 0) + 1.0) / (n0 + 9.0)))
        |           + (ln((coalesce(walpha.c1, 0) + 1.0) / (n1 + 10.0))
        |              - ln((coalesce(walpha.c0, 0) + 1.0) / (n0 + 10.0))),
        |           6) AS quality_score
        |  FROM f CROSS JOIN pri
        |  LEFT JOIN wlen ON f.f_len = wlen.v
        |  LEFT JOIN wmtl ON f.f_mtl = wmtl.v
        |  LEFT JOIN wstop ON f.f_stop = wstop.v
        |  LEFT JOIN walpha ON f.f_alpha = walpha.v)
        |SELECT doc_id, quality_score, quality_score >= 0 AS quality_pass
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w,
        |         len(regexp_extract_all(text, '\S+')) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |         CASE WHEN n_tokens = 0 THEN 0.0
        |              ELSE length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) * 1.0 / n_tokens
        |         END AS mean_token_len,
        |         len(list_distinct(list_filter(w,
        |           x -> x IN ('the','be','to','of','and','that','have','with')))) AS n_stopword_hits,
        |         CASE WHEN n_tokens = 0 THEN 0.0
        |              ELSE len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0 / n_tokens
        |         END AS alpha_fraction
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_token_len,
        |       CAST(n_stopword_hits AS BIGINT) AS n_stopword_hits, alpha_fraction,
        |       (n_tokens BETWEEN 50 AND 100000
        |        AND mean_token_len BETWEEN 3.0 AND 10.0
        |        AND n_stopword_hits >= 1
        |        AND alpha_fraction >= 0.8) AS gopher_pass
        |FROM s ORDER BY doc_id""".stripMargin,

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
        |FROM documents GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin,

    // same exactSum convention as q_pricing: decimal accumulation,
    // one final DOUBLE cast per cell
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,

    // bucket arithmetic mirrors the engine exactly: floor((x-lo)/width)
    // with binary-exact lo/width literals, >= hi clamped to the last
    // bucket, the bucket spine generated so empty buckets surface
    "q_histogram" ->
      """WITH c AS (
        |  SELECT LEAST(CAST(floor((l_extendedprice - 0.0) / 5000.0) AS BIGINT), 21) AS bucket,
        |         count(*) AS n
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND isfinite(l_extendedprice)
        |    AND l_extendedprice >= 0.0
        |  GROUP BY 1),
        |s AS (SELECT unnest(generate_series(0, 21)) AS bucket)
        |SELECT s.bucket, 0.0 + s.bucket * 5000.0 AS bucket_lo,
        |       0.0 + (s.bucket + 1) * 5000.0 AS bucket_hi,
        |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
        |FROM s LEFT JOIN c USING (bucket) ORDER BY s.bucket""".stripMargin,

    // exact decimal moments (order-independent), then textbook sample
    // variance on the identical double parts — every step after the
    // sums is correctly-rounded IEEE, so the z classification matches
    // the engine bit-for-bit
    "q_outliers" ->
      // finite-only and positive-variance guards mirror the engine: a
      // NaN/Inf row is excluded from n and sums alike, and singleton /
      // zero-variance groups classify nothing. abs(value) < 1e10 is the
      // engine's magnitude bound: value*value <= 1e20 leaves the summed
      // DECIMAL(38,6) >=1e12 rows of per-group headroom (the
      // groupMoments arithmetic — a larger bound lets the accumulated
      // square overflow, where the engines fail differently)
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
        |  FROM events
        |  WHERE value IS NOT NULL AND isfinite(value) AND abs(value) < 1e10
        |  GROUP BY event_type)
        |SELECT e.event_type, e.event_id, e.value AS value,
        |       (e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zscore
        |FROM events e JOIN s USING (event_type)
        |WHERE e.value IS NOT NULL AND isfinite(e.value) AND abs(e.value) < 1e10
        |  AND n > 1 AND (s2 - s1 * s1 / n) / (n - 1) > 0
        |  AND abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3.0
        |ORDER BY e.event_type ASC NULLS LAST, e.event_id""".stripMargin,

    // slots by integer floor-division of epoch-nanos; latest-in-slot by
    // (ts, event_id); per-key slot spine via generate_series; LOCF via
    // IGNORE NULLS last_value — same shapes as the engine's plan
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS slot,
        |         epoch_ns(ts) AS tsn, event_id, value
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |obs AS (
        |  SELECT user_id, slot, value FROM (
        |    SELECT user_id, slot, value,
        |           row_number() OVER (PARTITION BY user_id, slot
        |                              ORDER BY tsn DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(lo, hi)) AS slot
        |  FROM (SELECT user_id, min(slot) AS lo, max(slot) AS hi
        |        FROM e GROUP BY user_id)),
        |j AS (
        |  SELECT s.user_id, s.slot, o.value AS obs
        |  FROM spine s LEFT JOIN obs o
        |    ON s.user_id = o.user_id AND s.slot = o.slot)
        |SELECT user_id, CAST(slot * 86400000000 AS BIGINT) AS slot_start_us,
        |       last_value(obs IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY slot
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |       obs IS NULL AS filled
        |FROM j ORDER BY user_id, slot_start_us""".stripMargin,

    // ECDF merge over DISTINCT values (cardinality-, not corpus-sized),
    // integer counts, single long divisions — the max-|F_A−F_B| is
    // exact IEEE on identical inputs on both engines
    "q_drift" ->
      """WITH a AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
        |b AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
        |ka AS (SELECT v, count(*) AS ca FROM a GROUP BY 1),
        |kb AS (SELECT v, count(*) AS cb FROM b GROUP BY 1),
        |m AS (
        |  SELECT coalesce(ka.v, kb.v) AS v,
        |         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM ka FULL OUTER JOIN kb ON ka.v = kb.v),
        |c AS (
        |  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND CURRENT ROW) AS cum_a,
        |         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND CURRENT ROW) AS cum_b
        |  FROM m),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        |             CAST(count(*) AS BIGINT) AS n_values FROM m)
        |SELECT n_a, n_b, n_values,
        |       max(abs(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b)) AS ks_stat
        |FROM c, t GROUP BY n_a, n_b, n_values""".stripMargin,

    // the q_bigrams sliding-window machinery for pairs, q_lm_score's
    // tokenization for unigrams; the pmi expression SHAPE matches the
    // engine exactly (divisions/multiplications are correctly-rounded
    // IEEE; ln's last ulp is absorbed by round-6 on both sides)
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT CASE WHEN trim(text) = '' THEN []
        |              ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |uni AS (
        |  SELECT term, count(*) AS c_term
        |  FROM (SELECT unnest(w) AS term FROM toks) WHERE term <> '' GROUP BY 1),
        |bi AS (
        |  SELECT g, count(*) AS c_ab FROM (
        |    SELECT array_to_string(w[i : i + 1], ' ') AS g
        |    FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))
        |  GROUP BY 1 HAVING count(*) >= 5),
        |tot AS (
        |  SELECT (SELECT sum(c_term) FROM uni) AS n_uni,
        |         (SELECT count(*) FROM (
        |            SELECT 1 FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i))) AS n_bi)
        |SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
        |       c_ab, a.c_term AS c_a, b.c_term AS c_b,
        |       round(ln((c_ab / n_bi) / ((a.c_term / n_uni) * (b.c_term / n_uni))), 6) AS pmi
        |FROM bi, tot
        |JOIN uni a ON a.term = split_part(g, ' ', 1)
        |JOIN uni b ON b.term = split_part(g, ' ', 2)
        |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 50""".stripMargin,

    // consecutive-gap lag window, integer nanos end to end; ties carry
    // gap 0 so lag-order ambiguity can never cross the threshold
    "q_gaps" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (
        |  SELECT user_id, lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn) AS prev, tsn
        |  FROM e)
        |SELECT user_id, prev // 1000 AS gap_start_us, tsn // 1000 AS gap_end_us,
        |       (tsn - prev) // 1000 AS gap_us
        |FROM g WHERE tsn - prev > 172800000000000
        |ORDER BY user_id, gap_start_us""".stripMargin,

    // the bucketed layout changes the PLAN, never the answer — the
    // oracle is the plain join+aggregate
    "q_colocated_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // same whitespace tokenization as q_lm_score; smooth idf
    // (ln((N+1)/(df+1))+1) with the score ROUNDED to 6 decimals on both
    // sides and the rank ordered by the rounded score — engine-portable
    // despite ln's last-ulp libm variance
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(
        |           trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |           x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |         round(tf.tf * (ln((nd + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS "rank"
        |      FROM scored)
        |SELECT doc_id, term, tf, df, score, "rank"
        |FROM r WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin,

    // Discrete-rank medians (the q_quantiles rank arithmetic at p=0.5)
    // for value and deviation alike; dev/gate are single IEEE
    // subtract/multiply/compare on identical doubles, so both engines
    // classify the same rows. Zero-MAD groups classify nothing (the
    // zOutliers zero-variance posture).
    "q_outliers_mad" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value::DOUBLE AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)),
        |m AS (
        |  SELECT event_type,
        |         MAX(CASE WHEN rk = floor(0.5 * (n - 1)) + 1 THEN v END) AS med
        |  FROM (SELECT event_type, v,
        |               row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
        |               count(*) OVER (PARTITION BY event_type) AS n
        |        FROM r)
        |  GROUP BY event_type),
        |d AS (
        |  SELECT r.event_type, r.event_id, r.v, abs(r.v - m.med) AS dev
        |  FROM r JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type,
        |         MAX(CASE WHEN rk = floor(0.5 * (n - 1)) + 1 THEN dev END) AS mad
        |  FROM (SELECT event_type, dev,
        |               row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
        |               count(*) OVER (PARTITION BY event_type) AS n
        |        FROM d)
        |  GROUP BY event_type)
        |SELECT d.event_type, d.event_id, d.v AS value, d.dev AS abs_dev, md.mad AS mad
        |FROM d JOIN md USING (event_type)
        |WHERE md.mad > 0 AND d.dev > 3.0 * md.mad
        |ORDER BY d.event_type ASC NULLS LAST, d.event_id""".stripMargin,

    // Shares divide exact BIGINT counts (cum_share divides the exact
    // CUMULATIVE count, not a float running sum) — identical doubles.
    // Full (count desc, key asc NULLS LAST) ordering makes the top-k
    // cut deterministic under ties on both engines.
    "q_heavy_hitters" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
        |t AS (SELECT sum(n_rows) AS total FROM c),
        |top AS (
        |  SELECT user_id, n_rows FROM c
        |  ORDER BY n_rows DESC, user_id ASC NULLS LAST LIMIT 20)
        |SELECT user_id, n_rows,
        |       n_rows::DOUBLE / total AS share,
        |       (sum(n_rows) OVER (ORDER BY n_rows DESC, user_id ASC NULLS LAST
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       )::DOUBLE / total AS cum_share
        |FROM top CROSS JOIN t
        |ORDER BY n_rows DESC, user_id ASC NULLS LAST""".stripMargin,

    // Trailing RANGE frame on the epoch-nanos axis: SQL RANGE includes
    // all same-instant peers on both engines; finite-only count+sum in
    // DECIMAL(38,6) (order-independent), avg one guarded IEEE division
    // (0/0 would be +Inf on Spark, NULL here — both sides emit NULL).
    // abs(value) < 1e20 is the engine's accumulated-sum headroom bound
    // (the zOutliers/groupMoments arithmetic: each term leaves the
    // windowed DECIMAL(38,6) sum >=1e12 frame rows of headroom) —
    // out-of-bound values are excluded from count and sum alike, on
    // both engines.
    "q_rolling" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value::DOUBLE AS value
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |win AS (
        |  SELECT user_id, ts_ns, event_id, value,
        |         count(CASE WHEN value IS NOT NULL AND isfinite(value)
        |                         AND abs(value) < 1e20
        |                    THEN 1 END) OVER w AS n_win,
        |         CAST(sum(CASE WHEN value IS NOT NULL AND isfinite(value)
        |                            AND abs(value) < 1e20
        |                       THEN CAST(value AS DECIMAL(38,6)) END) OVER w
        |              AS DOUBLE) AS sum_win
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
        |               RANGE BETWEEN 604800000000000 PRECEDING AND CURRENT ROW))
        |SELECT user_id, ts_ns, event_id, value, n_win, sum_win,
        |       CASE WHEN n_win > 0 THEN sum_win / n_win END AS avg_win
        |FROM win ORDER BY user_id, ts_ns, event_id""".stripMargin,

    // SCD2: lead() runs over ALL events of the key (a tombstone closes
    // the version before it), tombstones filter AFTER with the engine's
    // NULL-predicate-counts-as-deleted posture.
    "q_scd2" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS valid_from_seq,
        |         lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
        |           AS valid_to_seq,
        |         epoch_us(ts) AS ts_us, event_type, value, props
        |  FROM events)
        |SELECT user_id, valid_from_seq, valid_to_seq,
        |       valid_to_seq IS NULL AS is_current,
        |       ts_us, event_type, value, props
        |FROM v
        |WHERE NOT coalesce(event_type = 'delete', TRUE)
        |ORDER BY user_id ASC NULLS LAST, valid_from_seq""".stripMargin,

    // Ties at the same micros order by event_id — the lag window's total
    // order matches the engine's (ts_ns = micros×1000, same ordering).
    "q_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type,
        |         event_type AS next_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
        |c AS (
        |  SELECT prev_type, next_type, count(*) AS n_pairs
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n_pairs) AS BIGINT) AS n_from
        |      FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, n_pairs, n_from,
        |       CAST(n_pairs AS DOUBLE) / n_from AS p
        |FROM c JOIN t USING (prev_type)
        |ORDER BY 1, 2""".stripMargin,

    // Full a×b grid (structural zeros included); expected = na·nb/nt as
    // DOUBLE, each cell's ((o−e)·(o−e))/e rounded to 6 then accumulated
    // in DECIMAL(38,6) — the engine's exactSum mirror.
    "q_chi2" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, count(*) AS n
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
        |grid AS (
        |  SELECT rt.a, ct.b, na, nb, nt,
        |         CAST(coalesce(n, 0) AS DOUBLE) AS o,
        |         CAST(na AS DOUBLE) * nb / nt AS e
        |  FROM rt CROSS JOIN ct CROSS JOIN tt
        |  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
        |SELECT max(nt) AS n_rows,
        |       CAST(count(DISTINCT a) AS BIGINT) AS n_a,
        |       CAST(count(DISTINCT b) AS BIGINT) AS n_b,
        |       (CAST(count(DISTINCT a) AS BIGINT) - 1)
        |         * (CAST(count(DISTINCT b) AS BIGINT) - 1) AS dof,
        |       CAST(SUM(CAST(round((o - e) * (o - e) / e, 6)
        |                     AS DECIMAL(38,6))) AS DOUBLE) AS chi2
        |FROM grid""".stripMargin,

    // q_histogram's bucket edges (floor((x−lo)/width), ≥hi clamps into
    // the last bucket, <lo drops), Laplace-smoothed shares
    // p = (c+0.5)/(n+0.5·24), per-bucket term rounded to 6 before the
    // DECIMAL(38,6) accumulation — absorbs the engines' 1-ulp ln().
    "q_psi" ->
      """WITH a AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE doc_id % 2 <> 0),
        |ka AS (
        |  SELECT least(CAST(floor((v - 0.0) / 25.0) AS BIGINT), 23) AS bucket,
        |         count(*) AS ca
        |  FROM a WHERE v IS NOT NULL AND isfinite(v) AND v >= 0.0 GROUP BY 1),
        |kb AS (
        |  SELECT least(CAST(floor((v - 0.0) / 25.0) AS BIGINT), 23) AS bucket,
        |         count(*) AS cb
        |  FROM b WHERE v IS NOT NULL AND isfinite(v) AND v >= 0.0 GROUP BY 1),
        |spine AS (SELECT range AS bucket FROM range(24)),
        |m AS (
        |  SELECT spine.bucket, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM spine LEFT JOIN ka USING (bucket) LEFT JOIN kb USING (bucket)),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |             CAST(sum(cb) AS BIGINT) AS n_b FROM m)
        |SELECT n_a, n_b, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(SUM(CAST(round(
        |         ((ca + 0.5) / (n_a + 12.0) - (cb + 0.5) / (n_b + 12.0))
        |           * ln(((ca + 0.5) / (n_a + 12.0))
        |                / ((cb + 0.5) / (n_b + 12.0))), 6)
        |         AS DECIMAL(38,6))) AS DOUBLE) AS psi
        |FROM m, t GROUP BY n_a, n_b""".stripMargin,

    // ntile is the SQL-standard earlier-buckets-larger split over a
    // total order (metric DESC, user_id) — identical on both engines;
    // monetary accumulates in DECIMAL(38,6) so both order the same
    // doubles. DuckDB's ntile returns BIGINT — cast to match Spark's
    // IntegerType.
    "q_rfm" ->
      """WITH per AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS frequency,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |tiles AS (
        |  SELECT user_id, last_us, frequency, monetary,
        |         CAST(ntile(5) OVER (ORDER BY last_us DESC, user_id)
        |              AS INTEGER) AS r_tile,
        |         CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
        |              AS INTEGER) AS f_tile,
        |         CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
        |              AS INTEGER) AS m_tile
        |  FROM per)
        |SELECT user_id, last_us, frequency, monetary, r_tile, f_tile, m_tile,
        |       CAST(r_tile * 100 + f_tile * 10 + m_tile AS INTEGER) AS segment
        |FROM tiles ORDER BY user_id""".stripMargin,

    // The q_scd2 history filtered to the interval covering seq 5000 —
    // disjoint per-key intervals mean at most one row per key.
    "q_state_at" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS valid_from_seq,
        |         lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
        |           AS valid_to_seq,
        |         epoch_us(ts) AS ts_us, event_type, value, props
        |  FROM events)
        |SELECT user_id, valid_from_seq, valid_to_seq,
        |       ts_us, event_type, value, props
        |FROM v
        |WHERE NOT coalesce(event_type = 'delete', TRUE)
        |  AND valid_from_seq <= 5000
        |  AND (valid_to_seq IS NULL OR valid_to_seq > 5000)
        |ORDER BY user_id ASC NULLS LAST, valid_from_seq""".stripMargin,

    "q_kanon" ->
      """SELECT lang, source, count(*) AS n_rows
        |FROM documents
        |GROUP BY 1, 2 HAVING count(*) < 10
        |ORDER BY lang ASC NULLS LAST, source ASC NULLS LAST""".stripMargin,

    // Running event-time max over the preceding (seq-ordered) frame.
    // Regression detection runs in FULL NANOS (the engine's axis — the
    // q_gaps epoch_ns posture) and only the reported worst lateness
    // floors to micros; comparing in epoch_us would miss sub-micro
    // regressions on a nanos-precision events layout.
    "q_disorder" ->
      """WITH w AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn,
        |         max(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(coalesce(sum(CASE WHEN pm IS NOT NULL AND tsn < pm
        |                               THEN 1 ELSE 0 END), 0) AS BIGINT)
        |         AS n_regressions,
        |       max(CASE WHEN pm IS NOT NULL AND tsn < pm
        |                THEN (pm - tsn) // 1000 END) AS max_late_us
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    // All-pairs Levenshtein over the 32-char prefixes — the blocking in
    // the engine is lossless (PassJoin pigeonhole), so the brute-force
    // SQL is the exact oracle; integer distance on both engines.
    "q_neardup_edit" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 32) AS s
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id1, id2""".stripMargin,

    "q_cube" ->
      """SELECT event_type, (user_id % 10) AS bucket, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        |       CAST(GROUPING(event_type, (user_id % 10)) AS BIGINT) AS gset
        |FROM events
        |GROUP BY CUBE (event_type, (user_id % 10))
        |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST, gset""".stripMargin,

    // Raw moments accumulate in DECIMAL(38,6); every derived quantity
    // repeats the engine's exact +,−,×,÷,√ sequence — bit-identical, no
    // rounding step needed (no transcendentals anywhere).
    "q_moments" ->
      """WITH src AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE n_chars IS NOT NULL
        |    AND NOT isnan(CAST(n_chars AS DOUBLE))
        |    AND abs(CAST(n_chars AS DOUBLE)) < 1e5),
        |g AS (
        |  SELECT lang, count(*) AS n_rows,
        |         CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(v*v AS DECIMAL(38,6))) AS DOUBLE) AS s2,
        |         CAST(SUM(CAST(v*v*v AS DECIMAL(38,6))) AS DOUBLE) AS s3,
        |         CAST(SUM(CAST(v*v*v*v AS DECIMAL(38,6))) AS DOUBLE) AS s4
        |  FROM src GROUP BY 1),
        |m AS (
        |  SELECT lang, n_rows, s1 / n_rows AS mean, s2 / n_rows AS r2,
        |         s3 / n_rows AS r3, s4 / n_rows AS r4
        |  FROM g),
        |c AS (
        |  SELECT lang, n_rows, mean,
        |         r2 - mean * mean AS m2,
        |         r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
        |         r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
        |           - 3.0 * mean * mean * mean * mean AS m4
        |  FROM m)
        |SELECT lang, n_rows, mean, m2 AS variance,
        |       CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END AS skewness,
        |       CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurtosis
        |FROM c ORDER BY lang ASC NULLS LAST""".stripMargin,

    // Shared-term JSD fold with the closed-form absent-mass correction;
    // ln 2 is a shared literal (0.6931471805599453) so no libm call can
    // diverge; round-6 terms + DECIMAL accumulation as everywhere.
    "q_jsd" ->
      """WITH tok AS (
        |  SELECT lang AS c, tok AS t
        |  FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |        FROM documents WHERE lang IS NOT NULL) x
        |  WHERE tok <> ''),
        |cnt AS (SELECT c, t, count(*) AS n FROM tok GROUP BY 1, 2),
        |tot AS (SELECT c, CAST(sum(n) AS BIGINT) AS ntot FROM cnt GROUP BY 1),
        |p AS (SELECT c, t, CAST(n AS DOUBLE) / ntot AS p
        |      FROM cnt JOIN tot USING (c)),
        |j AS (
        |  SELECT a.c AS class_a, b.c AS class_b,
        |         count(*) AS shared,
        |         CAST(SUM(CAST(round(
        |           a.p * ln(2.0 * a.p / (a.p + b.p))
        |             + b.p * ln(2.0 * b.p / (a.p + b.p)), 6)
        |           AS DECIMAL(38,6))) AS DOUBLE) AS s,
        |         CAST(SUM(CAST(a.p AS DECIMAL(38,6))) AS DOUBLE) AS pab,
        |         CAST(SUM(CAST(b.p AS DECIMAL(38,6))) AS DOUBLE) AS qab
        |  FROM p a JOIN p b ON a.t = b.t AND a.c < b.c
        |  GROUP BY 1, 2),
        |spine AS (
        |  SELECT x.c AS class_a, y.c AS class_b
        |  FROM tot x CROSS JOIN tot y WHERE x.c < y.c)
        |SELECT class_a, class_b,
        |       CAST(coalesce(shared, 0) AS BIGINT) AS n_shared_terms,
        |       round(0.5 * (coalesce(s, 0.0)
        |             + (1.0 - coalesce(pab, 0.0)) * 0.6931471805599453
        |             + (1.0 - coalesce(qab, 0.0)) * 0.6931471805599453), 6) AS jsd
        |FROM spine LEFT JOIN j USING (class_a, class_b)
        |ORDER BY 1, 2""".stripMargin,

    // The q_lang_id scorer feeding a per-class report: class spine is
    // the union of true and predicted labels; degenerate denominators
    // stay NULL; divisions and the f1 fold are single IEEE sequences.
    "q_eval_langid" ->
      """WITH scored AS (
        |  SELECT lang,
        |    length(text) AS n_chars,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|with|that)\b')) AS en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS de,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|une)\b')) AS fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|una|que)\b')) AS es
        |  FROM documents WHERE text IS NOT NULL),
        |pred AS (
        |  SELECT lang,
        |         CASE WHEN n_chars > 0 AND cjk * 1.0 / n_chars > 0.2 THEN 'zh'
        |              WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
        |              WHEN en = greatest(en, de, fr, es) THEN 'en'
        |              WHEN de = greatest(en, de, fr, es) THEN 'de'
        |              WHEN fr = greatest(en, de, fr, es) THEN 'fr'
        |              ELSE 'es' END AS lang_pred
        |  FROM scored),
        |cells AS (
        |  SELECT lang AS l, lang_pred AS p, count(*) AS n
        |  FROM pred WHERE lang IS NOT NULL AND lang_pred IS NOT NULL
        |  GROUP BY 1, 2),
        |sup AS (SELECT l AS class, CAST(sum(n) AS BIGINT) AS support
        |        FROM cells GROUP BY 1),
        |prd AS (SELECT p AS class, CAST(sum(n) AS BIGINT) AS predicted
        |        FROM cells GROUP BY 1),
        |tp AS (SELECT l AS class, n AS tp FROM cells WHERE l = p),
        |m AS (
        |  SELECT class,
        |         coalesce(support, 0) AS support,
        |         coalesce(predicted, 0) AS predicted,
        |         CAST(coalesce(tp, 0) AS BIGINT) AS tp
        |  FROM sup FULL OUTER JOIN prd USING (class)
        |       LEFT JOIN tp USING (class)),
        |r AS (
        |  SELECT class, support, predicted, tp,
        |         CASE WHEN predicted > 0
        |              THEN CAST(tp AS DOUBLE) / predicted END AS precision,
        |         CASE WHEN support > 0
        |              THEN CAST(tp AS DOUBLE) / support END AS recall
        |  FROM m)
        |SELECT class, support, predicted, tp, precision, recall,
        |       CASE WHEN precision + recall > 0
        |            THEN 2.0 * precision * recall / (precision + recall)
        |            END AS f1
        |FROM r ORDER BY class""".stripMargin,

    // Retrains the IDENTICAL NB model (same sample cut, same top-512
    // vocab head with count-desc/gram-asc ties, same Laplace algebra on
    // exact counts) and rescores with the engine's exact fold: per
    // class, in-vocab trigram terms sum in STREAM ORDER (list_sum over
    // the filtered stream — the q_lm_score proven pattern) and the
    // prior adds once — bit-identical score doubles, so the argmax
    // (score DESC, class ASC) and therefore the whole report agree
    // with no rounding step. substr counts CHARACTERS, matching the
    // kernel's codepoint indexing.
    "q_langid_clf" ->
      """WITH norm AS (
        |  SELECT doc_id, lang,
        |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
        |  FROM documents),
        |samp AS (
        |  SELECT lang, s FROM norm
        |  WHERE lang IS NOT NULL AND s IS NOT NULL
        |  ORDER BY doc_id LIMIT 500),
        |sgrams AS (
        |  SELECT lang,
        |         unnest(list_transform(range(1, length(s) - 1),
        |                               i -> substr(s, i, 3))) AS g
        |  FROM samp WHERE length(s) >= 3),
        |vocab AS (
        |  SELECT g, count(*) AS gc FROM sgrams GROUP BY g
        |  ORDER BY gc DESC, g LIMIT 512),
        |vtot AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |classes AS (SELECT lang, count(*) AS n_c FROM samp GROUP BY lang),
        |ctot AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_tot,
        |                CAST(count(*) AS BIGINT) AS n_cls FROM classes),
        |cc AS (
        |  SELECT sg.lang, sg.g, count(*) AS c
        |  FROM sgrams sg JOIN vocab vo ON vo.g = sg.g
        |  GROUP BY 1, 2),
        |totc AS (SELECT lang, CAST(sum(c) AS BIGINT) AS total_c
        |         FROM cc GROUP BY lang),
        |grid AS (
        |  SELECT cl.lang, vo.g,
        |         ln((coalesce(cc.c, 0) + 1.0)
        |            / CAST(coalesce(tc.total_c, 0) + vt.v AS DOUBLE)) AS term
        |  FROM classes cl CROSS JOIN vocab vo CROSS JOIN vtot vt
        |  LEFT JOIN totc tc ON tc.lang = cl.lang
        |  LEFT JOIN cc ON cc.lang = cl.lang AND cc.g = vo.g),
        |model AS (
        |  SELECT lang, map(list(g ORDER BY g), list(term ORDER BY g)) AS m
        |  FROM grid GROUP BY lang),
        |priors AS (
        |  SELECT cl.lang,
        |         ln((cl.n_c + 1.0) / CAST(ct.n_tot + ct.n_cls AS DOUBLE)) AS prior
        |  FROM classes cl CROSS JOIN ctot ct),
        |docg AS (
        |  SELECT doc_id, lang AS true_lang,
        |         CASE WHEN length(s) >= 3
        |              THEN list_transform(range(1, length(s) - 1),
        |                                  i -> substr(s, i, 3))
        |              ELSE [] END AS gs
        |  FROM norm WHERE s IS NOT NULL),
        |scores AS (
        |  SELECT d.doc_id, d.true_lang, mo.lang AS cls,
        |         p.prior + coalesce(list_sum(list_transform(
        |           list_filter(d.gs, g -> len(map_extract(mo.m, g)) > 0),
        |           g -> list_extract(map_extract(mo.m, g), 1))), 0.0) AS score
        |  FROM docg d CROSS JOIN model mo JOIN priors p ON p.lang = mo.lang),
        |pred AS (
        |  SELECT doc_id, true_lang, cls AS lang_pred
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, cls ASC) AS rk FROM scores)
        |  WHERE rk = 1),
        |cells AS (
        |  SELECT true_lang AS l, lang_pred AS p, count(*) AS n
        |  FROM pred WHERE true_lang IS NOT NULL AND lang_pred IS NOT NULL
        |  GROUP BY 1, 2),
        |sup AS (SELECT l AS class, CAST(sum(n) AS BIGINT) AS support
        |        FROM cells GROUP BY 1),
        |prd AS (SELECT p AS class, CAST(sum(n) AS BIGINT) AS predicted
        |        FROM cells GROUP BY 1),
        |tp AS (SELECT l AS class, n AS tp FROM cells WHERE l = p),
        |m2 AS (
        |  SELECT class,
        |         coalesce(support, 0) AS support,
        |         coalesce(predicted, 0) AS predicted,
        |         CAST(coalesce(tp, 0) AS BIGINT) AS tp
        |  FROM sup FULL OUTER JOIN prd USING (class)
        |       LEFT JOIN tp USING (class)),
        |r AS (
        |  SELECT class, support, predicted, tp,
        |         CASE WHEN predicted > 0
        |              THEN CAST(tp AS DOUBLE) / predicted END AS precision,
        |         CASE WHEN support > 0
        |              THEN CAST(tp AS DOUBLE) / support END AS recall
        |  FROM m2)
        |SELECT class, support, predicted, tp, precision, recall,
        |       CASE WHEN precision + recall > 0
        |            THEN 2.0 * precision * recall / (precision + recall)
        |            END AS f1
        |FROM r ORDER BY class""".stripMargin,

    // Per-row list_distinct mirrors the engine's map-side array_distinct
    // — df counts DOCUMENTS, never occurrences.
    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT CASE WHEN trim(text) = '' THEN []
        |              ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |g AS (
        |  SELECT unnest(list_distinct(list_transform(
        |           generate_series(1, len(w) - 2),
        |           i -> array_to_string(w[i : i + 2], ' ')))) AS ngram
        |  FROM toks)
        |SELECT ngram, COUNT(*) AS df
        |FROM g GROUP BY 1 HAVING COUNT(*) >= 5
        |ORDER BY df DESC, ngram ASC LIMIT 50""".stripMargin,

    // The exact q_heavy_hitters surface + sketch_ok audit flags that are
    // THEOREMS of the Misra-Gries bounds — deterministically TRUE (the
    // q_profile_approx / approx_ok precedent). NULL keys are excluded
    // from BOTH engine sides (the sketch's domain), so the exact CTE
    // here filters them too — shares divide the non-NULL total.
    "q_heavy_hitters_approx" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_rows FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |t AS (SELECT sum(n_rows) AS total FROM c),
        |top AS (
        |  SELECT user_id, n_rows FROM c
        |  ORDER BY n_rows DESC, user_id ASC NULLS LAST LIMIT 20)
        |SELECT user_id, n_rows,
        |       n_rows::DOUBLE / total AS share,
        |       (sum(n_rows) OVER (ORDER BY n_rows DESC, user_id ASC NULLS LAST
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       )::DOUBLE / total AS cum_share,
        |       TRUE AS sketch_ok
        |FROM top CROSS JOIN t
        |ORDER BY n_rows DESC, user_id ASC NULLS LAST""".stripMargin,
  )
}
