package graft

/** DuckDB oracle SQL — dedup/near-dup pipelines, similarity/ANN, search,
  * time joins, and tokenization/packing (the other half of SparkEntry's
  * declared-query contract; conventions in [[SparkEntry.oracleSql]]).
  * `entries` is a def so it always evaluates after the private oracle
  * building blocks below are initialized.
  */
private[graft] object OracleSqlSimilarity {

  def entries: Map[String, String] = Map(
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

    // Character histogram + ln terms summed in ascending-character order
    // (list ORDER BY c + list_sum) — the same left-to-right IEEE
    // summation the kernel runs, rounded to 6 (the ln convention).
    // text[i:i] slicing is codepoint-indexed where the kernel indexes
    // UTF-16 units — identical on the ASCII fixture (the standing
    // hash-kernel caveat).
    "q_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, length(text)+1), i -> text[i:i])) AS c
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(k)::DOUBLE AS n FROM cnt GROUP BY 1),
        |lst AS (SELECT doc_id, list(k ORDER BY c) AS ks FROM cnt GROUP BY 1)
        |SELECT l.doc_id,
        |       round(list_sum(list_transform(ks, k -> (k::DOUBLE / n) * ln(n / k::DOUBLE))), 6)
        |         AS entropy
        |FROM lst l JOIN tot t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // The exact cross-side Jaccard pairs (the neardupOracle machinery
    // restricted to batch × history) — the persisted-index probe's
    // banding has total recall on the fixture (the q_neardup_minhash
    // precedent), so the exact set IS the contract.
    "q_neardup_incr" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |sh0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM sh0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS new_id, b.doc_id AS old_id, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |  GROUP BY 1, 2)
        |SELECT new_id, old_id, c * 1.0 / (na.n + nb.n - c) AS jaccard
        |FROM inter
        |JOIN sizes na ON new_id = na.doc_id
        |JOIN sizes nb ON old_id = nb.doc_id
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |ORDER BY new_id, old_id""".stripMargin,

    // The Bloom pre-gate never changes the answer (no false negatives;
    // false positives only re-route rows to the exact anti-join), so the
    // oracle is the SAME plain NOT EXISTS as q_dedup_incr on the mod-7
    // batch split.
    "q_dedup_bloom" ->
      """SELECT doc_id FROM documents n
        |WHERE doc_id % 7 = 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents h
        |    WHERE h.doc_id % 7 <> 0
        |      AND trim(regexp_replace(h.text, '\s+', ' ', 'g'))
        |          = trim(regexp_replace(n.text, '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,

    // Same derived old snapshot (7-drop → added, 5-vowel-case → changed,
    // ghost row → removed) and the same normalized-text md5 fingerprint
    // as TextOps.corpusDiff; statuses are strings, ids integers —
    // hash-exact.
    "q_corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN translate(text, 'ae', 'AE')
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL SELECT -1, 'ghost document'),
        |o AS (SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM old),
        |n AS (SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |      FROM documents),
        |d AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT doc_id, status FROM d WHERE status IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // Per-vector max-abs scale in DOUBLE; divide-then-multiply order
    // fixed; both engines round ties away from zero. The isfinite guard
    // mirrors the kernel's NULL-codes contract for NaN/Inf scales
    // (Kernels.quantizeInt8): DuckDB ranks NaN above every value, so
    // list_max propagates a NaN/Inf element into scale, `NaN > 0` is
    // TRUE, and the unguarded round(NaN)::INT would ERROR where the
    // engine returns NULL codes.
    "q_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scale,
        |         CASE WHEN isfinite(scale) AND scale > 0
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

    // The batched flavor: same dimension-order DOUBLE cosine, ranked
    // per query by (cos desc, id) — the engine's per-branch TakeOrdered.
    "q_sim_topk_batch" ->
      """WITH qs AS (
        |  SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id IN (0, 1, 2)),
        |scored AS (
        |  SELECT qs.query_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, len(e.embedding)),
        |                            i -> e.embedding[i]::DOUBLE * qs.qv[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(qs.qv, x -> x::DOUBLE * x::DOUBLE)))) AS cos_sim
        |  FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> qs.query_id)
        |SELECT query_id, vec_id, cos_sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_sim DESC, vec_id) AS rk
        |  FROM scored)
        |WHERE rk <= 10
        |ORDER BY query_id, cos_sim DESC, vec_id""".stripMargin,

    // Exact all-pairs ground truth for the banded vector near-dup
    // (threshold 0.5 — the fixture-meaningful regime; see the query).
    // SemDeDup ground truth: ALL-pairs cosine ≥ 0.5 (no clustering — the
    // engine's bucketed pairs are grid-probed to full recall on this
    // fixture, so bucketing must lose nothing), then the same
    // transitive-closure + keep-min-reachable collapse as
    // q_neardup_dedup, over vec_ids.
    "q_semdedup" ->
      """WITH RECURSIVE scored AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(generate_series(1, len(a.embedding)),
        |                            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |pairs AS (SELECT id1, id2 FROM scored WHERE cos_sim >= 0.5),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |r(n, m) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.n, e.b FROM r JOIN edges e ON r.m = e.a)
        |SELECT vec_id FROM embeddings v
        |WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.n = v.vec_id AND r.m < v.vec_id)
        |ORDER BY vec_id""".stripMargin,

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

    // Gumbel-top-k weighted sampling: the same md5-u32 machinery as
    // q_sample, u = (u32 + 0.5)/2^32 exact in both engines, the key
    // ln(w) - ln(-ln(u)) rounded to 6 with an id tie-break (the tfidf
    // ordering convention) so the cut is ulp-immune.
    "q_sample_weighted" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |           round(ln(n_chars::DOUBLE)
        |                 - ln(-ln((('0x' || substr(md5('ws:' || lang || ':' || doc_id), 1, 8))::BIGINT
        |                           + 0.5) / 4294967296.0)), 6) DESC,
        |           doc_id ASC) AS rk
        |  FROM documents
        |  WHERE lang IS NOT NULL AND doc_id IS NOT NULL
        |    AND n_chars IS NOT NULL AND n_chars > 0)
        |WHERE rk <= 30 ORDER BY doc_id""".stripMargin,

    // Same md5 digest text and (digest, id) ordering as TextOps.sourceCap
    // — both engines emit lowercase-hex md5 and compare it
    // lexicographically, so the per-source winner set is identical.
    "q_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5('cap:' || source || ':' || doc_id), doc_id) AS rk
        |  FROM documents
        |  WHERE source IS NOT NULL AND doc_id IS NOT NULL) t
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

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

    // Paragraph dedup: same 10-token tiling as the kernel (q_chunk pins
    // the contract), canonical occurrence = first (doc_id, tile_ix) per
    // tile CONTENT (the engine ranks md5 fingerprints — same equality),
    // docs with no cut tiles pass through with original text, docs whose
    // every tile is cut come back empty (string_agg over zero kept rows
    // is NULL → coalesce '').
    "q_paradup" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 10)) AS s
        |  FROM toks WHERE len(w) > 0),
        |tiles AS (
        |  SELECT doc_id, (s // 10)::INT AS tile_ix,
        |         array_to_string(w[s + 1 : s + 10], ' ') AS tile_text
        |  FROM c),
        |ranked AS (
        |  SELECT doc_id, tile_ix, tile_text,
        |         row_number() OVER (PARTITION BY tile_text
        |                            ORDER BY doc_id, tile_ix) AS rn
        |  FROM tiles),
        |agg AS (
        |  SELECT doc_id,
        |         coalesce(string_agg(tile_text, ' ' ORDER BY tile_ix)
        |                    FILTER (WHERE rn = 1), '') AS new_text,
        |         COUNT(*) FILTER (WHERE rn > 1) AS removed_tiles,
        |         COUNT(*) AS total_tiles
        |  FROM ranked GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN a.doc_id IS NULL OR a.removed_tiles = 0 THEN d.text
        |            ELSE a.new_text END AS text,
        |       coalesce(a.removed_tiles, 0)::BIGINT AS removed_tiles,
        |       coalesce(a.total_tiles, 0)::BIGINT AS total_tiles
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Span-level exact-substring dedup: stride-1 full 10-token windows
    // (generate_series 0..len-10 == the kernel's full-window starts, no
    // tails), canonical occurrence = first (doc_id, p) per window
    // CONTENT (the engine groups 16-byte md5 — same equality), and a
    // token is cut iff some non-canonical duplicated window start lies
    // in [i-9, i]. Docs with no cuts pass through with ORIGINAL text
    // (both engines only whitespace-normalize rebuilt docs); all-cut
    // docs come back empty (string_agg over zero kept rows is NULL →
    // coalesce '').
    "q_substring_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, w, unnest(generate_series(0, len(w) - 10)) AS p
        |  FROM toks WHERE len(w) >= 10),
        |occ AS (
        |  SELECT doc_id, p, array_to_string(w[p + 1 : p + 10], ' ') AS wt
        |  FROM win),
        |ranked AS (
        |  SELECT doc_id, p,
        |         row_number() OVER (PARTITION BY wt ORDER BY doc_id, p) AS rn,
        |         count(*) OVER (PARTITION BY wt) AS n_occ
        |  FROM occ),
        |cuts AS (SELECT doc_id, p FROM ranked WHERE n_occ > 1 AND rn > 1),
        |tok AS (
        |  SELECT doc_id, unnest(w) AS t,
        |         CAST(generate_subscripts(w, 1) - 1 AS BIGINT) AS i
        |  FROM toks WHERE len(w) > 0),
        |cut_tok AS (
        |  SELECT DISTINCT tok.doc_id, tok.i
        |  FROM tok JOIN cuts ON cuts.doc_id = tok.doc_id
        |                    AND cuts.p BETWEEN tok.i - 9 AND tok.i),
        |agg AS (
        |  SELECT tok.doc_id,
        |         coalesce(string_agg(tok.t, ' ' ORDER BY tok.i)
        |                  FILTER (WHERE cut_tok.i IS NULL), '') AS new_text,
        |         count(cut_tok.i) AS removed,
        |         count(*) AS total
        |  FROM tok LEFT JOIN cut_tok
        |    ON cut_tok.doc_id = tok.doc_id AND cut_tok.i = tok.i
        |  GROUP BY tok.doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN a.doc_id IS NULL OR a.removed = 0 THEN d.text
        |            ELSE a.new_text END AS text,
        |       coalesce(a.removed, 0)::BIGINT AS removed_tokens,
        |       coalesce(a.total, 0)::BIGINT AS total_tokens
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

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
        |FROM e GROUP BY 1, 2 ORDER BY label ASC NULLS LAST, dim""".stripMargin,

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
        |FROM r GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin,

    // Cross-engine GK-sketch values can't hash-match, so the contract is
    // the exact quantiles plus the engine-side rank-bound check: the
    // oracle asserts approx_ok IS true — a sketch estimate drifting past
    // its rank guarantee turns the row red.
    "q_quantiles_approx" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |         COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang,
        |       MAX(CASE WHEN rk = floor(0.5 * (n - 1)) + 1 THEN n_chars END) AS p50,
        |       MAX(CASE WHEN rk = floor(0.9 * (n - 1)) + 1 THEN n_chars END) AS p90,
        |       MAX(CASE WHEN rk = floor(0.99 * (n - 1)) + 1 THEN n_chars END) AS p99,
        |       TRUE AS approx_ok
        |FROM r GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin,

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

    // Same sliding-window machinery as q_bigrams, filtered to the
    // phrase: overlapping occurrences each count (all windows with
    // multiplicity), docs without the phrase drop out, integer ranking.
    "q_phrase" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |                      ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, count(*) AS n
        |  FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        |  WHERE array_to_string(w[i : i + 1], ' ') = 'table hash'
        |  GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
        |FROM c ORDER BY n DESC, doc_id LIMIT 10""".stripMargin,

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

    // Same mix arithmetic + the rate decision: least(1, target/share)
    // for targeted sources, 1.0 otherwise — identical IEEE expression
    // shape to TextOps.mixRebalance.
    "q_mix_rebalance" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         SUM(CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
        |                  ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |                     - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', ''))
        |                     + 1 END)::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |m AS (
        |  SELECT source, n_docs, n_tokens,
        |         n_tokens::DOUBLE / (SUM(n_tokens) OVER ())::DOUBLE AS token_share
        |  FROM s)
        |SELECT source, n_docs, n_tokens, token_share,
        |       CASE WHEN source = 'src0' THEN least(1.0, 0.02 / token_share)
        |            WHEN source = 'src1' THEN least(1.0, 0.1 / token_share)
        |            ELSE 1.0 END AS rate
        |FROM m ORDER BY source""".stripMargin,

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
        |  FROM embeddings WHERE label IS NOT NULL),
        |cent AS (
        |  SELECT label AS clabel, dim,
        |         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
        |         / COUNT(v) AS av
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
        |  FROM embeddings e CROSS JOIN cl
        |  WHERE e.label IS NOT NULL),
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
