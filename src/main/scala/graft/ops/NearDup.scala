package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines (north-star
  * extension, BASELINE.json): word-shingle Jaccard (exact verify stage),
  * banded MinHash (the 100 TB candidate generator), 64-bit SimHash with
  * pigeonhole blocking, and embedding-cosine near-dup pairs.
  *
  * Everything is built-in expressions, no UDFs. Caveat learned the hard
  * way: higher-order functions (transform/aggregate/zip_with) evaluate
  * INTERPRETED with no common-subexpression elimination, so shingle/
  * signature arrays are always materialized by a dedicated projection
  * before anything iterates over them, and the per-doc SimHash uses an
  * explode + codegen'd hash aggregate instead of HOF folds.
  *
  * Scale doctrine — three-stage shape shared by every variant:
  *   1. per-doc signature/shingle computation: map-side, linear scan;
  *   2. candidate generation: equi-join on a SMALL key (band hash /
  *      16-bit SimHash chunk / shingle) — never an all-pairs product;
  *   3. exact verification (Jaccard / Hamming / cosine) on candidates
  *      only.
  * [[exactJaccardPairs]] keeps exactness AND bounded candidates via
  * lossless prefix filtering (Chaudhuri et al., SSJoin): only each doc's
  * globally-rarest `|A| − ⌈t·|A|⌉ + 1` shingles join, so a boilerplate
  * shingle shared by m docs no longer emits O(m²) candidate rows — it
  * sorts to the END of every prefix order and drops out. For
  * tunable-recall candidate generation at even lower cost, use
  * [[minhashCandidatePairs]] (bounded bands per doc) with
  * [[jaccardVerify]].
  */
object NearDup {

  private def emptyStrings: Column = expr("CAST(array() AS array<string>)")

  /** Whitespace-normalized word tokens. */
  def wordTokens(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  /** Distinct word k-shingles (first-occurrence order); docs shorter than
    * k words have none (mirrors the declared oracle's generate_series
    * bounds). Native codegen'd expression — see
    * [[graft.functions.WordShingles]]. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.native.wordShingles(text, k)

  /** Candidate pairs by LOSSLESS prefix filtering (SSJoin): under any
    * global total order on shingles, two sets with |A∩B| ≥ α must share
    * an element among the first |A|−α+1 of A and the first |B|−α+1 of B.
    * Jaccard ≥ t implies |A∩B| ≥ ⌈t·|A|⌉ (and symmetrically for B), so
    * joining only each doc's first `|A| − ⌈t·|A|⌉ + 1` shingles misses
    * no qualifying pair — for ANY global order. Two orders are offered:
    *
    *  - `order = "hash"` (default): global order = a 64-bit shingle hash
    *    computed per row by the ONE-pass compiled
    *    [[graft.functions.ShingleHashes]] kernel (shingles → hash →
    *    sort; any consistent hash is a valid total order), so the
    *    candidate stage performs ZERO shuffles of the exploded corpus —
    *    the only exchanges in the whole operator are over id pairs. The
    *    join key is the 8-byte hash, not the shingle string (a hash
    *    collision can only ADD a candidate — the verify stage rejects
    *    it — never lose one, since equal shingles have equal hashes).
    *    At 100 TB this is the difference between shuffling the exploded
    *    corpus twice and not shuffling it at all.
    *  - `order = "docfreq"`: global order = (document frequency asc,
    *    shingle asc), the classic rarest-first heuristic. Costs a
    *    corpus-wide window over the exploded shingles (shuffle by
    *    shingle, then by id) but BOUNDS candidates under corpus-wide
    *    boilerplate: a shingle shared by a large fraction of docs sorts
    *    to the end of every doc's order and is excluded from long docs'
    *    prefixes, so it cannot create an O(m²) bucket. With hash order
    *    such a shingle still lands in ~(1−t) of its docs' prefixes.
    *    Measured sf0.1/32 cores: ~2× the hash order's wall time, ~0.5×
    *    its candidate volume — pick it for boilerplate-heavy corpora.
    *
    * Output: distinct (id1, id2), id1 < id2 — a superset of the
    * Jaccard-≥-t pairs, exact after [[jaccardVerify]]. Losslessness of
    * BOTH orders is pinned by NearDupProps against a driver-side
    * all-pairs model.
    */
  def prefixFilterCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.8,
      order: String = "hash"): DataFrame = order match {
    case "hash"    => prefixFilterCandidatesHash(df, idCol, textCol, k, threshold)
    case "docfreq" => prefixFilterCandidatesDocFreq(df, idCol, textCol, k, threshold)
    case other => throw new IllegalArgumentException(
      s"""unknown prefix order "$other" (expected "hash" or "docfreq")""")
  }

  /** ⌈t·n⌉-derived prefix length with a RELATIVE rounding guard: the
    * product's FP error is ≤ ~n·t·2⁻⁵³, so subtracting n·t·1e-12 (plus
    * an absolute floor for tiny n) dominates it at ANY set size —
    * overshoot may only LENGTHEN the prefix (keeping it lossless), never
    * shorten it. (A bare absolute 1e-9 stops covering the error once n·t
    * exceeds ~9e6.) */
  private def prefixLenExpr(threshold: Double): Column =
    col("n") - ceil(col("n") * (threshold * (1 - 1e-12)) - lit(1e-9)) + 1

  /** Size filter (also lossless): J ≥ t forces t·|A| ≤ |B| AND
    * t·|B| ≤ |A|, so size-incompatible prefix collisions are dropped IN
    * the join (same one-ulp-safe relative guard as the prefix length —
    * relaxing the bound only admits extra candidates for the verify
    * stage to reject). Cuts the candidate set ~3× on the size-diverse
    * fixture before any array is touched. */
  private def sizeCompatibleExpr(threshold: Double): Column =
    col("n1") * (threshold * (1 - 1e-12)) <= col("n2") &&
      col("n2") * (threshold * (1 - 1e-12)) <= col("n1")

  /** Hash-ordered prefix candidates: see [[prefixFilterCandidates]]. */
  private def prefixFilterCandidatesHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    // per-row pipeline: ONE compiled shingle_hashes kernel pass
    // (shingles → hash → sort; the HOF transform(xxhash64) it replaced
    // evaluated interpreted per shingle) → slice(prefix) → explode; no
    // exchange anywhere before the self-join
    val prefix = df
      .select(col(idCol).as("id"),
        graft.functions.native.shingleHashes(col(textCol), k).as("__h"))
      .select(col("id"), size(col("__h")).as("n"), col("__h"))
      .select(col("id"), col("n"),
        explode(slice(col("__h"), lit(1),
          prefixLenExpr(threshold).cast("int"))).as("h"))
    // merge-hinted self-join (r22): the two sides' exchanges are
    // canonically equal, so AQE plans ONE exchange and a ReusedExchange
    // for the other side — the whole scan→kernel→explode pipeline runs
    // ONCE (the previous AQE broadcast re-evaluated it for the build
    // side and paid a single-threaded broadcast build: measured 0.82 s
    // → 0.48 s for the candidate stage at sf0.1/32 cores, and at scale
    // a corpus-derived broadcast is not an option at all). Guide §2.4
    // remove shuffles outright / §1.2 don't compute twice.
    prefix.select(col("h"), col("id").as("id1"), col("n").as("n1")).hint("merge")
      .join(prefix.select(col("h"), col("id").as("id2"), col("n").as("n2")), "h")
      .filter(col("id1") < col("id2") && sizeCompatibleExpr(threshold))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Doc-frequency-ordered prefix candidates: see
    * [[prefixFilterCandidates]]. */
  private def prefixFilterCandidatesDocFreq(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // set size from the array itself (free in the projection) — a window
    // over id here would cost a full shuffle of every shingle row
    val sh = df
      .select(col(idCol).as("id"), shingles(col(textCol), k).as("__sh"))
      .select(col("id"), size(col("__sh")).as("n"), explode(col("__sh")).as("s"))
      .withColumn("df", count(lit(1)).over(W.partitionBy(col("s"))))
    // Per-doc rarest-first selection via a row_number window. A
    // collect_list + sort_array + slice aggregate looks cheaper (hash agg
    // + per-doc sorts instead of a full (id, df, s) sort) and IS faster
    // in isolation — but collect_list is a NON-DETERMINISTIC expression,
    // which disables several optimizer paths through the self-join below
    // (measured 2× slower end-to-end). The deterministic window wins on
    // the whole query.
    val prefix = sh
      .withColumn(
        "rk",
        row_number().over(W.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rk") <= prefixLenExpr(threshold))
    // Join strategy is left to the optimizer: AQE broadcasts the (small)
    // prefix relation, which re-evaluates the prefix pipeline for the
    // build side but skips both join exchanges + sorts — measured FASTER
    // than forcing shuffle_hash (6.6 s vs 2.4 s end-to-end at sf0.1/32
    // cores; ReuseExchange can't collapse the two sides either way
    // because the plans only canonicalize equal up to the window, not
    // through the differing output aliases).
    prefix.select(col("s"), col("id").as("id1"), col("n").as("n1"))
      .join(prefix.select(col("s"), col("id").as("id2"), col("n").as("n2")), "s")
      .filter(col("id1") < col("id2") && sizeCompatibleExpr(threshold))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Exact Jaccard-threshold pairs: lossless prefix-filtered candidates
    * ([[prefixFilterCandidates]] — `order` selects the hash-ordered
    * zero-shuffle default or the boilerplate-armored doc-freq variant),
    * then exact verification over the full shingle sets. Identical
    * results to the naive full inverted-index join (the DuckDB oracle's
    * formulation) under EITHER order.
    * Output: (id1, id2, jaccard), id1 < id2.
    *
    * Cost note (measured sf0.1/32 cores, warm min-of-3): hash order
    * ~0.9 s end-to-end (82K candidates) vs doc-freq ~1.2 s (44K) vs
    * ~1.2 s for the old uncapped join that dies on boilerplate-heavy
    * corpora. For throughput-first near-dup at scale use
    * [[minhashNearDupPairs]] (~0.7 s here, same verified output on the
    * fixture).
    */
  def exactJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.8,
      order: String = "hash"): DataFrame =
    jaccardVerifySelective(
      prefixFilterCandidates(df, idCol, textCol, k, threshold, order),
      df, idCol, textCol, k, threshold)

  /** [[jaccardVerify]] with OPT-IN candidate-id pruning (r22, guide
    * §3.2 reduce the big side before shuffling it — the verdict's
    * pair-ids semi-join). With `spark.graft.neardup.pruneVerify=true`
    * the corpus is semi-joined down to the candidates' distinct ids
    * BEFORE any shingle set is built, so the verify stage's shingle
    * kernel and exchanges run over candidate docs only — the 100 TB
    * shape for corpora whose candidates are selective (the
    * banded-MinHash family: 479 of 5 000 ids even at sf0.1). The ids
    * subplan hangs off the SAME candidate aggregate as the verify's
    * pair input, and AQE's runtime exchange reuse evaluates the
    * candidate pipeline once — no materialization, no counting jobs.
    *
    * DEFAULT OFF, deliberately: a cardinality-derived runtime switch
    * (localCheckpoint the pairs, count distinct ids vs the corpus) was
    * built and interleave-measured first — the eager checkpoint plus
    * two count jobs serialize stages that previously overlapped and
    * cost +0.3–1.0 s per family query at sf0.1/32 cores, far more than
    * the pruning saves at that scale, while the prefix-filter family's
    * candidates cover 92 % of the fixture corpus so its prune never
    * fires at all. At 100 TB enable the flag where candidate
    * selectivity is expected (near-dup rates ≪ 1); an id list beyond
    * broadcast reach (~100 M+ ids) wants the Bloom-filter variant of
    * guide §3.2 instead. Pruning cannot change the result — only
    * candidate ids are ever joined (NearDupSpec pins equality). */
  private def jaccardVerifySelective(
      pairs: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    val prune = df.sparkSession.conf
      .getOption("spark.graft.neardup.pruneVerify").exists(_.toBoolean)
    val target =
      if (prune) {
        val ids = pairs.select(col("id1").as(idCol))
          .union(pairs.select(col("id2").as(idCol)))
          .distinct()
        df.join(broadcast(ids), Seq(idCol), "left_semi")
      } else df
    jaccardVerify(pairs, target, idCol, textCol, k, threshold)
  }

  /** Per-doc MinHash signature: one-hash-with-mixes native kernel
    * ([[graft.functions.MinHashSignature]]). Callers must filter out
    * shingle-less docs first (an empty shingle set has no meaningful
    * signature, and identical degenerate signatures would bucket all
    * short docs together). */
  def minhashSignature(sh: Column, perms: Int = 64): Column =
    graft.functions.native.minhashSignature(sh, perms)

  /** (id, band, bucket) banded MinHash rows — the shared signature stage
    * of [[minhashCandidatePairs]] and the persisted signature index
    * ([[writeMinhashIndex]]/[[probeMinhashIndex]]). The banding
    * expression is THE contract: index rows written by one release must
    * bucket identically to probe rows computed by another, so both paths
    * call this one method (the NearDupStream sharing discipline). */
  private def bandedRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      bands: Int,
      rowsPerBand: Int): DataFrame =
    df.select(col(idCol).as("id"), shingles(col(textCol), k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), minhashSignature(col("__sh"), bands * rowsPerBand).as("sig"))
      .select(
        col("id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit("band"), lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)))
      .toDF("id", "band", "bucket")

  /** Candidate pairs by banded MinHash: signatures are cut into `bands`
    * rows-per-band slices, docs join on (band index, band hash). Each doc
    * emits exactly `bands` join keys — candidate volume is bounded by
    * bucket occupancy, not document length. Output: distinct (id1, id2),
    * id1 < id2. */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val banded = bandedRows(df, idCol, textCol, k, bands, rowsPerBand)
    // merge-hinted for exchange reuse: one evaluation of the
    // shingle→minhash-signature pipeline instead of two (see
    // prefixFilterCandidatesHash)
    banded.select(col("band"), col("bucket"), col("id").as("id1")).hint("merge")
      .join(banded.select(col("band"), col("bucket"), col("id").as("id2")), Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs: joins the shingle
    * sets back in and computes true Jaccard — stage 3 of the scale shape.
    * `pairs` must have (id1, id2). */
  def jaccardVerify(
      pairs: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol).as("__id"), shingles(col(textCol), k).as("__sh"))
    // Explicit repartition: candidate pairs are BYTES-sized rows, so AQE
    // coalesces their exchange toward ONE partition — but each row's
    // verify cost (array_intersect/union over full shingle sets) is
    // orders of magnitude above its size, serializing the whole verify
    // stage onto one core (measured 3.8 s vs 0.9 s at sf0.1/32 cores).
    // A user-specified partition count is exempt from AQE coalescing.
    pairs.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .join(sets.select(col("__id").as("id1"), col("__sh").as("sh1")), "id1")
      .join(sets.select(col("__id").as("id2"), col("__sh").as("sh2")), "id2")
      .select(
        col("id1"),
        col("id2"),
        (size(array_intersect(col("sh1"), col("sh2"))) /
          size(array_union(col("sh1"), col("sh2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The scale-path near-dup operator: banded-MinHash candidates, exact
    * Jaccard verify. With default banding, recall at jaccard ≥ 0.8 is
    * 1-(1-0.8⁴)¹⁶ ≈ 0.9998 per pair; precision is exact (verify stage).
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame =
    jaccardVerifySelective(
      minhashCandidatePairs(df, idCol, textCol, k, bands, rowsPerBand),
      df, idCol, textCol, k, threshold)

  private def minhashPartExpr(nParts: Int) =
    pmod(xxhash64(lit("part"), col("band"), col("bucket")), lit(nParts.toLong)).cast("int")

  /** Persist the corpus's banded MinHash signature rows as a
    * `part`-partitioned parquet table — the incremental-crawl
    * amortization model (the bm25/LSH index posture): the history's
    * shingle→signature work and its side of the candidate join are paid
    * ONCE at index time; each day's batch then probes WITHOUT
    * recomputing anything over the history. `part` is a hash of
    * (band, bucket) mod `nParts`, so a probe batch reads only the
    * partitions its own (band, bucket) keys land in —
    * `PartitionFilters` pruning, spec-pinned. Layout params (k, bands,
    * rowsPerBand, nParts) must match between write and probe; both
    * sides derive from the same [[bandedRows]] expression. */
  def writeMinhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      nParts: Int = 64): Unit = {
    // Generations layout (graft.ops.Generations): the part dirs live in
    // a numbered generation; a rebuild writes the next one and flips
    // atomically, so concurrent probes keep the index they resolved
    val (fs, root) = Generations.fsRoot(df.sparkSession, path)
    Generations.rebuild(fs, root) { gen =>
      // files ∝ parts, not tasks×parts — the compacted layout
      // compactMinhashIndex restores (Similarity.spreadForWrite doc)
      Similarity.spreadForWrite(
        bandedRows(df, idCol, textCol, k, bands, rowsPerBand)
          .withColumn("part", minhashPartExpr(nParts)),
        nParts, col("part"))
        .write.partitionBy("part").mode("overwrite").parquet(gen)
    }
  }

  /** Append a new batch's signature rows to an existing index (same
    * layout params as the write) — the close of the incremental loop:
    * probe today's batch against the index, then append the batch so
    * tomorrow's probe sees it as history. Append-only parquet under the
    * SAME partition dirs — at most `spread` files per touched part per
    * batch ([[Similarity.spreadForWrite]]; exactly one once nParts ≥ 2×
    * cluster parallelism), so run [[compactMinhashIndex]] on the
    * small-file cadence (the IVF/LSH generation-swap discipline,
    * probe-equality preserved).
    * FS CONTRACT: appends serialize on the root's `_GEN_LOCK`, whose
    * mutual exclusion needs atomic create-exclusive on the index root's
    * filesystem — [[graft.ops.Generations.acquireLock]] refuses
    * object-store roots unless producers are serialized externally and
    * `-Dgraft.generations.allowNonAtomicFs=true` says so. */
  def appendMinhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      nParts: Int = 64): Unit = {
    // under the producer lock: an append resolves its generation once,
    // and a compaction flipping the pointer mid-append would strand the
    // appended rows in the retired generation (silently dropped at the
    // next sweep) — the lock turns that into one side failing fast.
    // Concurrent appends serialize too; they'd be file-safe (unique
    // part-file names) but the daily-batch cadence has no use for the
    // parallelism that would complicate the lock's meaning.
    val (fs, root) = Generations.fsRoot(df.sparkSession, path)
    Generations.withLock(fs, root, "appendMinhashIndex") {
      // ≤ spread files per TOUCHED part per batch instead of
      // tasks×parts (spread = 1 once nParts ≥ 2× cluster parallelism)
      Similarity.spreadForWrite(
        bandedRows(df, idCol, textCol, k, bands, rowsPerBand)
          .withColumn("part", minhashPartExpr(nParts)),
        nParts, col("part"))
        .write.partitionBy("part").mode("append")
        .parquet(Generations.currentDir(fs, root).toString)
    }
  }

  /** Compact an append-accumulated MinHash signature index — the
    * signature-index flavor of [[graft.ops.Similarity.compactIndex]]:
    * every [[appendMinhashIndex]] batch adds one file per touched
    * `part` directory, so a daily-ingest index scans batches×parts
    * small files after a quarter — compaction rewrites the layout to
    * ONE file per part (each part value hashes to exactly one task of
    * the `repartition(part)` write) and leaves probes and future
    * appends untouched semantically (probe equality before/after is
    * spec-pinned).
    *
    * Crash-safe, probe-transparent swap via the [[Generations]]
    * layout: sweep retired generations, write the compacted next
    * generation FULLY, commit with one atomic sentinel create.
    * Concurrent PROBES keep the generation they resolved (it survives
    * until the next compaction's sweep) — no unavailability window, no
    * marker/heal protocol; a crash at any point leaves either the old
    * committed generation (retry re-compacts) or the new one (retry
    * re-compacts a no-op). APPENDS are serialized against compaction
    * by the root's `_GEN_LOCK` ([[Generations]]): an append landing in
    * the old generation after the union read would be silently dropped
    * by the flip, so whichever producer arrives second now fails fast
    * instead — the enforced form of the close-the-ingest-generation
    * rule the IVF/LSH compactor shares. A probe that outlives the
    * cycle — still holding a DataFrame over the retired generation when
    * the NEXT compaction sweeps it — fails loudly
    * (FileNotFoundException on its next action), never returns partial
    * rows (spec: GenerationsSpec). FS CONTRACT: the `_GEN_LOCK`'s
    * mutual exclusion needs atomic create-exclusive on the index
    * root's filesystem — [[graft.ops.Generations.acquireLock]] refuses
    * object-store roots unless producers are serialized externally and
    * `-Dgraft.generations.allowNonAtomicFs=true` says so. Returns
    * false (touching nothing) when the index does not exist. */
  def compactMinhashIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val (fs, root) = Generations.fsRoot(spark, path)
    if (Generations.resolve(fs, root).isEmpty) return false
    // one critical section from resolve to flip (see
    // Similarity.compactIndex): the lock serializes this against
    // appendMinhashIndex and concurrent compactions, so the generation
    // the lazy read below scans can never be swept mid-compaction
    Generations.withLock(fs, root, "compactMinhashIndex") {
      val cur = Generations.currentDir(fs, root)
      val compacted = spark.read.parquet(cur.toString).repartition(col("part"))
      Generations.rebuildLocked(fs, root) { gen =>
        compacted.write.partitionBy("part").mode("overwrite").parquet(gen)
      }
      true
    }
  }

  /** Incremental near-dup: `incoming` checked against the PERSISTED
    * history index — every (new_id, old_id, jaccard ≥ threshold) cross
    * pair, exact-verified. The batch flavor of
    * [[graft.streaming.NearDupStream]], and the near-dup counterpart of
    * [[graft.ops.TextOps.dedupAgainst]] (which only sees exact
    * fingerprint equality).
    *
    * Scale shape: the batch's signatures compute in one kernel pass;
    * the index read is pruned to the ≤ `nParts` partitions the batch's
    * (band, bucket) keys hash into (the part list is a bounded driver
    * collect, ≤ `nParts` ints); candidates travel as bare id pairs; the
    * exact verify SEMI-JOINS history∪batch down to candidate ids before
    * any shingle set is built or exchanged — history text is scanned
    * once, shingled only for candidates (at 100 TB, store the corpus
    * id-partitioned so even the scan prunes). Within-batch pairs are
    * deliberately NOT emitted (that is [[minhashNearDupPairs]] on the
    * batch); ids must be globally unique across history and batch.
    *
    * Recall is the banding curve (≈0.9998 at the defaults for j ≥ 0.8);
    * precision is exact. On the declared fixture recall is total —
    * equality with the exact cross-pair set is the oracle contract
    * (the q_neardup_minhash precedent).
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12): wall-ratio 1.21 at
    * ×8 in the post-build steady state (min-of-2; the first run pays
    * the one-off index write — the q_bm25_indexed amortization shape,
    * with PartitionFilters pruning spec-pinned). */
  def probeMinhashIndex(
      path: String,
      history: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      nParts: Int = 64): DataFrame = {
    val spark = incoming.sparkSession
    // localCheckpoint: the parts collect below and the candidate join
    // each consume newB — without materializing, the batch's whole
    // shingle→signature kernel pipeline (the operator's dominant per-row
    // cost) would execute TWICE per probe. Eager checkpoint pays it
    // once; the batch is the small side by contract.
    val newB = bandedRows(incoming, idCol, textCol, k, bands, rowsPerBand)
      .withColumn("part", minhashPartExpr(nParts))
      .localCheckpoint()
    // bounded driver collect: ≤ nParts distinct partition ids — turning
    // the join key into a literal IN list is what makes the parquet
    // scan's PartitionFilters prune (a join alone prunes nothing)
    val parts = newB.select(col("part")).distinct().collect().map(_.getInt(0)).toSeq
    if (parts.isEmpty) {
      // id columns keep idCol's ACTUAL type, not a hardcoded long: the
      // normal path emits the incoming id type, and a caller unioning
      // daily probe results would hit a type mismatch only on the day
      // every doc in the batch was shingle-less (r20 review finding)
      val idType = incoming.schema(idCol).dataType
      return incoming.sparkSession.emptyDataFrame
        .withColumn("new_id", lit(null).cast(idType))
        .withColumn("old_id", lit(null).cast(idType))
        .withColumn("jaccard", lit(null).cast("double"))
        .select("new_id", "old_id", "jaccard")
    }
    // read exactly the batch's part= directories (the shared
    // Similarity.prunedPartitionRead — safe: appendMinhashIndex writes
    // BATCH appends, no streaming-sink commit log in this layout), so
    // probe-time file listing is O(batch's parts), not O(nParts) dirs
    // times the accumulated append files. totalValues arms the
    // DENSE-probe short-circuit: a bulk batch whose keys hit ≥¾ of the
    // parts root-reads instead (one listing, no per-dir exists calls,
    // no parallel-discovery job) — the helper applies the probed-parts
    // predicate to that root read itself (structural since r18), so
    // either regime returns only the probed parts; the isin below is
    // the redundant belt (and documents the probe's semantics in place)
    val (idxFs, idxRoot) = Generations.fsRoot(spark, path)
    val idx = Similarity.prunedPartitionRead(
      spark, idxFs, Generations.currentDir(idxFs, idxRoot).toString,
      parts.map(p => s"part=$p"), totalValues = Some(nParts))
      .filter(col("part").isin(parts: _*))
    val cands = newB
      .select(col("part"), col("band"), col("bucket"), col("id").as("id1"))
      .join(idx.select(col("part"), col("band"), col("bucket"), col("id").as("id2")),
        Seq("part", "band", "bucket"))
      .filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    val needed = cands.select(col("id1").as(idCol))
      .union(cands.select(col("id2").as(idCol)))
      .distinct()
    val all = history.select(col(idCol), col(textCol))
      .unionByName(incoming.select(col(idCol), col(textCol)))
      .join(broadcast(needed), Seq(idCol), "left_semi")
    jaccardVerify(cands, all, idCol, textCol, k, threshold)
      .select(col("id1").as("new_id"), col("id2").as("old_id"), col("jaccard"))
      // repartition(1)+sortWithinPartitions, not orderBy (r22): the
      // cross-pair set is bounded (≪ corpus), the total order is
      // identical, and a global sort's range-partitioning SAMPLE job
      // would re-execute the whole probe pipeline a second time — the
      // same trade the q_neardup_jaccard declaration documents
      // (measured +40% there)
      .repartition(1).sortWithinPartitions(col("new_id"), col("old_id"))
  }

  /** 64-bit SimHash over word tokens: each token's 64-bit MD5-derived
    * hash ([[graft.functions.Md5Hash64]] — chosen over xxhash64 because
    * DuckDB computes the identical value, making the operator fully
    * oracle-checkable) votes ±1 per bit position, weighted equally; the
    * sign of each position's tally is the output bit. Near-identical docs
    * differ in O(changed tokens) bits. NULL for token-less docs.
    *
    * Column-level (HOF) formulation, kept as the independent
    * cross-check for the native kernel (NearDupSpec asserts equality) —
    * the interpreted fold re-reads the token array per bit. Pipelines
    * use [[simhashes]] (one native kernel call per doc), which computes
    * the identical value. */
  def simhash64(text: Column): Column = {
    val t = wordTokens(text)
    val toks = when(size(t) === 1 && t.getItem(0) === "", emptyStrings).otherwise(t)
    // One hash per token (common-subexpression-eliminated across the
    // 64 statically-unrolled bit tallies below — shift amounts must be
    // literals for the codegen'd shiftright).
    val hashes = transform(toks, tok => graft.functions.native.md5Hash64(tok))
    val bits = (0 until 64).map { j =>
      val tally = aggregate(
        hashes,
        lit(0),
        (acc, h) =>
          acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(tally >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    when(size(toks) > 0, bits.reduce(_ bitwiseOR _))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stop-filtered winnow fingerprints, (id, f) rows — the shared stage
    * of [[winnowPairs]] and [[containmentPairs]].
    *
    * Stop-fingerprint filter: a fingerprint present in more than
    * `maxDocFreq` docs identifies a boilerplate phrase, not a copied
    * passage — discarding it loses no discriminative signal and bounds
    * every join bucket (without it, a corpus-wide common k-gram makes
    * the self-join quadratic; measured on the fixture, whose synthetic
    * vocabulary puts single 8-grams in 75% of docs). Doc frequency is a
    * window count (one shuffle on f), NOT a separate aggregate + join:
    * that shape re-ran the fingerprint kernel for the aggregate and for
    * each self-join side; here the kernel runs once and both join sides
    * reuse the same exchange, already partitioned (and sorted) by f. */
  private def winnowFiltered(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      window: Int,
      maxDocFreq: Int): DataFrame =
    df.select(col(idCol).as("id"), TextOps.winnowFingerprints(col(textCol), k, window).as("__fp"))
      .select(col("id"), explode(col("__fp")).as("f"))
      .withColumn(
        "__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("__df") <= maxDocFreq)

  /** Near-dup pairs by winnowing fingerprints
    * ([[graft.ops.TextOps.winnowFingerprints]]): docs sharing at least
    * `minShared` selected rolling-hash fingerprints. Same scale shape as
    * the MinHash path — fingerprints are the equi-join key, each doc
    * contributes O(len/window) of them. Winnowing guarantees any shared
    * run of ≥ window+k-1 chars produces a shared fingerprint, so this
    * catches copied PASSAGES, not just whole-document near-dups.
    *
    * Measured (r10 ScaleProbe, sf0.1 ×8 tiling, quiet machine): the
    * winnow-fingerprint self-join family lands 4.59 (q_containment) /
    * 5.52 (q_subsume) at ×8 — run-sensitive (a first run on the same
    * box recorded 1.5–2.0), so treat as a 2–6× band under the 8.0
    * linear ceiling; boilerplate-heavy corpora (one shared 250-char
    * block in half the docs) measure 0.87–1.08× vs clean because the
    * doc-frequency stop-filter drops the shared block's fingerprints
    * from candidate generation entirely. */
  def winnowPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      window: Int = 4,
      minShared: Int = 20,
      maxDocFreq: Int = 100): DataFrame = {
    val filtered = winnowFiltered(df, idCol, textCol, k, window, maxDocFreq)
    // merge-hinted for exchange reuse: the winnow kernel + explode +
    // f-exchange run once, both join sides hang below the same exchange
    // (see prefixFilterCandidatesHash)
    filtered.select(col("f"), col("id").as("id1")).hint("merge")
      .join(filtered.select(col("f"), col("id").as("id2")), "f")
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** ASYMMETRIC passage containment over winnow fingerprints: emit
    * (inner_id, outer_id) when at least `num/den` of the inner doc's
    * surviving fingerprints also appear in the outer doc — "doc A is
    * (mostly) inside doc B". The directional sibling of [[winnowPairs]]:
    * symmetric near-dup misses the quote/boilerplate-wrapper/excerpt
    * relationships a training corpus is full of (a short doc embedded in
    * a long one has tiny Jaccard but containment ≈ 1), and winnowing's
    * locality makes it catchable with the SAME fingerprint stage — a
    * selected fingerprint depends only on its k-gram neighborhood, so an
    * exact shared passage selects identical fingerprints in both docs
    * apart from O(window) boundary positions.
    *
    * The threshold is a RATIONAL (`num`/`den`, default 4/5): the filter
    * compares `shared·den ≥ n·num` in integers, so the engine and the
    * SQL oracle agree exactly at the boundary (a double threshold would
    * make 0.8·n a rounding question). Denominator counts the inner
    * doc's POST-stop-filter fingerprints: boilerplate mass is excluded
    * from both sides of the ratio, so a doc of pure boilerplate simply
    * has no discriminative fingerprints and emits nothing, rather than
    * being "contained" everywhere. Mutual containment (near-identical
    * docs) emits both directions — that is the honest answer.
    *
    * Scale shape: identical to [[winnowPairs]] (one kernel pass, one
    * fingerprint exchange reused by both join sides and the totals
    * aggregate, pair rows ≪ corpus); the directional expansion is a
    * ×2 map on the bounded pair set. Output: (inner_id, outer_id,
    * shared_fingerprints, n_fingerprints, containment). */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      window: Int = 4,
      num: Int = 4,
      den: Int = 5,
      maxDocFreq: Int = 100): DataFrame = {
    require(den >= 1 && num >= 1 && num <= den,
      s"containment threshold $num/$den must be a fraction in (0, 1]")
    // Directions expand by ONE explode on the bounded pair set followed
    // by a single totals join keyed on the inner id — the old shape
    // unioned two (shared ⋈ totals) branches, duplicating the whole
    // `shared` subtree (the expensive winnow self-join + aggregate) as
    // well as totals' join: six winnow-pipeline evaluations where three
    // suffice (r22; guide §1.2 don't compute twice). An in-pipeline
    // window count that would drop totals entirely (two evaluations)
    // was A/B'd and REJECTED: Window.partitionBy(id) sorts the full
    // fingerprint row set by id on both self-join sides, which costs
    // more than the totals subtree it saves (measured 3.20 s vs 1.99 s
    // baseline vs 1.5 s for this shape at sf0.1/32 cores).
    val filtered = winnowFiltered(df, idCol, textCol, k, window, maxDocFreq)
    val totals = filtered.groupBy(col("id")).agg(count(lit(1)).as("n_fingerprints"))
    // merge-hinted for exchange reuse, same as winnowPairs
    val shared = filtered.select(col("f"), col("id").as("id1")).hint("merge")
      .join(filtered.select(col("f"), col("id").as("id2")), "f")
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared_fingerprints"))
    shared
      .select(col("shared_fingerprints"), explode(array(
        struct(col("id1").as("inner_id"), col("id2").as("outer_id")),
        struct(col("id2").as("inner_id"), col("id1").as("outer_id")))).as("e"))
      .select(col("e.inner_id").as("inner_id"), col("e.outer_id").as("outer_id"),
        col("shared_fingerprints"))
      .join(totals.withColumnRenamed("id", "inner_id"), "inner_id")
      .select(col("inner_id"), col("outer_id"),
        col("shared_fingerprints"), col("n_fingerprints"))
      .filter(col("shared_fingerprints") * den >= col("n_fingerprints") * num)
      .withColumn(
        "containment",
        col("shared_fingerprints").cast("double") / col("n_fingerprints"))
  }

  /** Subsumption dedup — the curation policy [[containmentPairs]] exists
    * for: drop every document whose content is (≥ `num/den`) contained
    * in ANOTHER document, keeping the containers. Mutual containment
    * (near-identical docs) keeps the LOWEST id; strict containment
    * drops the inner doc regardless of id (the excerpt goes, the
    * full article stays — id order must not override content order).
    * A doc contained only in an itself-dropped doc is still dropped:
    * containment chains preserve content upward, so the top of every
    * chain survives.
    *
    * Scale shape: one aggregation over the pair set (≪ corpus) detects
    * mutuals, the corpus is touched exactly once by the final anti-join
    * — the same posture as [[collapseNearDups]] without the iteration
    * (subsumption needs no transitive closure: the drop decision is
    * per-edge). Output: the surviving rows of `df`, schema unchanged.
    *
    * Measured (Scale64 r15, sf0.1 decorrelated tiling): the declared
    * q_subsume pipeline's ×8 → ×64 octave is 4.11 (linear = 8.0) —
    * sub-linear across two octaves. */
  def dropSubsumed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      window: Int = 4,
      num: Int = 4,
      den: Int = 5,
      maxDocFreq: Int = 100): DataFrame = {
    // Mutual detection WITHOUT a pair-set self-join: each unordered pair
    // surfaces as one (strict) or two (mutual) directional rows, so one
    // groupBy on the unordered key decides the drop — containmentPairs
    // (the expensive winnowing pipeline) is evaluated exactly once, where
    // a self-join with reversed keys would defeat exchange reuse and run
    // it twice.
    val fwd = containmentPairs(df, idCol, textCol, k, window, num, den, maxDocFreq)
      .select(col("inner_id"), col("outer_id"))
    val drops = fwd
      .groupBy(
        least(col("inner_id"), col("outer_id")).as("__lo"),
        greatest(col("inner_id"), col("outer_id")).as("__hi"))
      .agg(count(lit(1)).as("__n"), min(col("inner_id")).as("__inner"))
      .select(when(col("__n") === 2, col("__hi")).otherwise(col("__inner")).as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Per-doc 64-bit SimHash as a DataFrame op: one native codegen'd
    * scalar call per document ([[graft.functions.SimHash64]] — tokenize,
    * md5, tally, pack in a single compiled pass). SimHash is a per-doc
    * SCALAR, so this is a pure projection: no row amplification, no
    * aggregation, no shuffle. (Earlier formulations exploded to one row
    * per token and ran a 64-column hash aggregate — correct, but paying
    * a 45× row blow-up for what one kernel pass computes.) Token-less
    * docs are dropped (≡ NULL simhash). Output: (id, sh). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("id"),
        graft.functions.native.simhash64(col(textCol)).as("sh"))
      .filter(col("sh").isNotNull)

  /** SimHash near-dup pairs with `maxHamming` ≤ 3 by default, using
    * 16-bit-chunk pigeonhole blocking: two hashes within Hamming 3 agree
    * exactly on at least one of four 16-bit chunks, so candidates come
    * from four equi-joins instead of an all-pairs scan. */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "pigeonhole blocking on 4 chunks covers Hamming <= 3")
    val hashed = simhashes(df, idCol, textCol)
    val chunked = hashed.select(
      col("id"),
      col("sh"),
      posexplode(array((0 until 4).map { j =>
        shiftright(col("sh"), 16 * j).bitwiseAND(lit(0xffffL))
      }: _*)))
      .toDF("id", "sh", "chunk", "key")
    // merge-hinted for exchange reuse: one simhash kernel pass instead
    // of two (see prefixFilterCandidatesHash)
    chunked.select(col("chunk"), col("key"), col("id").as("id1"), col("sh").as("sh1"))
      .hint("merge")
      .join(
        chunked.select(col("chunk"), col("key"), col("id").as("id2"), col("sh").as("sh2")),
        Seq("chunk", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hamming(col("sh1"), col("sh2")).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: don't shuffle rejects
      .distinct()
  }

  /** Deterministic segment layout for [[editDistancePairs]]:
    * `maxDist + 1` near-equal segments of a `prefixLen`-char string as
    * 1-based (start, length) — earlier segments take the remainder. */
  private[graft] def segmentBounds(prefixLen: Int, maxDist: Int): Seq[(Int, Int)] = {
    val k = maxDist + 1
    val base = prefixLen / k
    val rem = prefixLen % k
    val lens = Seq.tabulate(k)(i => base + (if (i < rem) 1 else 0))
    lens.scanLeft(1)(_ + _).zip(lens)
  }

  /** Edit-distance near-dup pairs over each document's `prefixLen`-char
    * prefix: every (id1, id2, dist) with Levenshtein distance ≤
    * `maxDist` — the short-string/near-title modality the shingle
    * family is weakest at (a 1-char typo in a 30-char title moves k=3
    * shingle Jaccard far below any sane threshold; edit distance calls
    * it 1). Candidate generation is PassJoin-style segment blocking
    * (Li, Deng & Feng, PVLDB 2011): split each full-length prefix into
    * `maxDist+1` segments — at distance ≤ maxDist at least one segment
    * of A appears ERROR-FREE in B, shifted at most `maxDist` positions
    * (pigeonhole over the alignment) — so candidates come from an
    * equi-join of exact segment keys against ±maxDist-shifted window
    * substrings, never an all-pairs product. Prefixes shorter than
    * `prefixLen` (doc shorter than the prefix) route through
    * length-band buckets instead (band width maxDist+1; distance ≤
    * maxDist bounds the length difference, so bands differ by ≤ 1 —
    * the probe side fans to band±1): short↔short and short↔full pairs
    * stay lossless without per-length segment indexes, and the band
    * buckets are EMPTY on a corpus whose docs all reach `prefixLen`
    * (zero cost on the fixture, a bounded tail at 100 TB).
    *
    * Scale shape: constant fan-out per doc ((maxDist+1)(2·maxDist+2)+3
    * ≈ 27 keys at maxDist=2), exchanges carry (segment-key, id) rows;
    * the Levenshtein verify runs on candidates only. Identical
    * prefixes shared by m docs yield m² TRUE pairs — quadratic output
    * is quadratic truth (the exactJaccardPairs posture); collapse with
    * [[collapseNearDups]] downstream. Exact integer distance on both
    * engines — the all-pairs SQL oracle is structural.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12): wall-ratio 2.15–2.19
    * at ×8 across two sessions — the near-linear band of the
    * shingle/minhash family (candidate volume tracks true near-pairs
    * under the vowel-mutated tiling, fan-out constant per doc). */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int = 32,
      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist must be >= 1")
    require(prefixLen >= 2 * (maxDist + 1),
      s"prefixLen=$prefixLen too short to split into ${maxDist + 1} useful segments")
    val segs = segmentBounds(prefixLen, maxDist)
    val base = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), substring(col(textCol), 1, prefixLen).as("__s"))
    val full = length(col("__s")) === prefixLen
    val lenBand = floor(length(col("__s")) / (maxDist + 1)).cast("long")
    def bandKey(b: Column) = struct(lit(-1).as("seg"), concat(lit("L"), b.cast("string")).as("k"))
    val segKeys = segs.zipWithIndex.map { case ((st, ln), i) =>
      struct(lit(i).as("seg"), substring(col("__s"), st, ln).as("k"))
    }
    val indexed = base
      .select(col("__id"),
        explode(when(full, array(segKeys: _*))
          .otherwise(array(bandKey(lenBand)))).as("e"))
      .select(col("__id"), col("e.seg").as("seg"), col("e.k").as("k"))
    val windowKeys = for {
      ((st, ln), i) <- segs.zipWithIndex
      off <- -maxDist to maxDist
      p = st + off
      if p >= 1
    } yield struct(lit(i).as("seg"), substring(col("__s"), p, ln).as("k"))
    val bandKeys = (-1 to 1).map(o => bandKey(lenBand + o))
    val probes = base
      .select(col("__id").as("__id2"),
        explode(array(windowKeys ++ bandKeys: _*)).as("e"))
      .select(col("__id2"), col("e.seg").as("seg"), col("e.k").as("k"))
    val cands = indexed.join(probes, Seq("seg", "k"))
      .filter(col("__id") =!= col("__id2"))
      .select(
        least(col("__id"), col("__id2")).as("id1"),
        greatest(col("__id"), col("__id2")).as("id2"))
      .distinct()
    val s1 = base.select(col("__id").as("id1"), col("__s").as("__s1"))
    val s2 = base.select(col("__id").as("id2"), col("__s").as("__s2"))
    cands
      .join(s1, "id1").join(s2, "id2")
      .withColumn("dist", levenshtein(col("__s1"), col("__s2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Collapse near-dup PAIRS into surviving documents — the last stage a
    * dedup pipeline actually needs (pairs alone don't dedupe, and
    * dropping `id2` of every pair is wrong under transitivity: a–b, b–c
    * must keep only a). Connected components over the undirected pair
    * graph by min-label propagation; each component keeps its minimum
    * id, docs in no pair survive untouched.
    *
    * Scale notes: labels exist only for docs appearing in a pair (the
    * near-dup set, typically ≪ corpus); each round computes its
    * equi-join + aggregate over that set exactly ONCE — locally as a
    * single job (lazy checkpoint whose changed-label count doubles as
    * the convergence check), reliably as the persist-across-write
    * recipe; round count ∝ component diameter (near-dup clusters are
    * near-cliques — 2-3 rounds in practice, `maxIter` caps adversarial
    * chains). The corpus itself is touched exactly once, by the final
    * anti-join against the non-representative ids. Measured (Scale64
    * r15, sf0.1 decorrelated tiling): the declared q_neardup_dedup
    * pipeline's ×8 → ×64 octave is 4.90 (linear = 8.0) — sub-linear
    * across two octaves, round count flat.
    *
    * Checkpoint hygiene (the iterative-algorithm storage contract):
    * `pairs` is scanned ONCE (explode emits both edge directions), each
    * round's checkpoint is unpersisted as soon as the next round
    * supersedes it, and everything except the final drop-set is released
    * before returning. When `spark.sparkContext.setCheckpointDir` is set
    * — the required configuration on a real cluster, where
    * `localCheckpoint`'s executor-resident blocks would die with an
    * executor — RELIABLE checkpoints are used instead: NOTHING stays in
    * the block manager, each checkpoint computes exactly once (persisted
    * across the file write), and superseded rounds DELETE their files
    * deterministically (Spark's own cleaner only does so under the
    * non-default `cleanCheckpoints=true`), leaving only the drop-set's
    * files behind the returned plan. Without a checkpoint dir
    * (local/test runs) the one retained block is that same drop-set —
    * ids of non-representative docs only — reclaimed by the
    * ContextCleaner when the returned plan is garbage-collected.
    */
  /** Release a SUPERSEDED checkpoint completely. `Dataset.unpersist`
    * only clears CacheManager-tracked (`Dataset.persist`) entries; a local
    * checkpoint persists at the RDD level underneath a [[LogicalRDD]], so
    * releasing its blocks needs the RDD itself. A reliable checkpoint
    * leaves FILES instead, which Spark deletes only under
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
    * default) — so superseded rounds delete their files deterministically
    * here rather than stranding O(rounds) file sets per invocation in the
    * cluster checkpoint dir. No-op for non-checkpoint plans. */
  /** `RDD.unpersist` on a locally-checkpointed RDD logs a WARN ("was
    * locally checkpointed … cannot be recomputed after unpersisting")
    * aimed at callers who might still USE the RDD. Here it is benign BY
    * CONSTRUCTION — only SUPERSEDED rounds are released, and nothing
    * re-reads them (CheckpointHygieneSpec pins the lifecycle) — but it
    * fires once per released round and pollutes every bench/run tail.
    * Raise that one logger to ERROR, once; the class logs nothing else
    * at WARN that this pipeline can trigger. */
  private lazy val silenceLocalCkptUnpersistWarning: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)

  private def releaseCheckpoint(ds: DataFrame): Unit =
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        silenceLocalCkptUnpersistWarning
        l.rdd.unpersist(false)
        l.rdd.getCheckpointFile.foreach { f =>
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(ds.sparkSession.sparkContext.hadoopConfiguration)
            .delete(path, true)
        }
      case _ => ()
    }

  /** Reliable checkpoint without the double compute: a reliable
    * checkpoint's file-write job RECOMPUTES the RDD's lineage, so the
    * plan is persisted across the write (the write job reads the cache)
    * and the transient cache dropped immediately after. */
  private def reliableCkpt(plan: DataFrame): DataFrame = {
    val cached = plan.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try cached.checkpoint() finally cached.unpersist(false)
  }

  def collapseNearDups(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val (labels, release) = componentLabels(pairs, maxIter, reliable)
    // pin ONLY the tiny drop-set (non-representative ids), then free the
    // loop state — the returned anti-join depends on nothing else
    val dropPlan =
      labels.filter(col("label") < col("node")).select(col("node").as(idCol))
    val drop =
      if (reliable) reliableCkpt(dropPlan) else dropPlan.localCheckpoint()
    release()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[collapseNearDups]] with a KEEPER POLICY: each near-dup component
    * keeps its best member by `scoreCol` (highest score, ties to the
    * lowest id) instead of the lowest id — the policy real curation
    * pipelines want (keep the longest / highest-quality member of a
    * duplicate cluster, drop the rest). Same component structure,
    * checkpoint hygiene, and loud non-convergence as [[collapseNearDups]].
    *
    * Scale note: one extra touch of the corpus — a join of the member
    * set (≪ corpus) against `(id, score)` to score members — plus a
    * per-COMPONENT window over members only; the full corpus is still
    * touched exactly once by the final anti-join. */
  def collapseNearDupsKeepBest(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      scoreCol: String,
      maxIter: Int = 50): DataFrame = {
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val (labels, release) = componentLabels(pairs, maxIter, reliable)
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("__score").desc, col("node").asc)
    val dropPlan = labels
      .join(df.select(col(idCol).as("node"), col(scoreCol).as("__score")), "node")
      .withColumn("__rk", row_number().over(W))
      .filter(col("__rk") > 1)
      .select(col("node").as(idCol))
    val drop =
      if (reliable) reliableCkpt(dropPlan) else dropPlan.localCheckpoint()
    release()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Min-label propagation over the undirected pair graph: labels every
    * node appearing in a pair with its component's minimum id. Returns
    * the converged `(node, label)` frame (checkpointed) and the release
    * hook that frees ALL loop state — callers MUST derive and checkpoint
    * their drop-set from `labels` and then call release before building
    * the final plan. Throws (after releasing) when `maxIter` rounds
    * don't converge. */
  private def componentLabels(
      pairs: DataFrame,
      maxIter: Int,
      reliable: Boolean): (DataFrame, () => Unit) = {
    // one scan of `pairs` builds both edge directions — the old
    // self-union evaluated the (expensive) pair pipeline twice
    val edgesPlan = pairs
      .select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val edges =
      if (reliable) reliableCkpt(edgesPlan) else edgesPlan.localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var prevRound: Option[DataFrame] = None
    var converged = false
    var i = 0
    // one min-label propagation round over the current labels; __chg
    // marks nodes whose label shrank this round
    def step(l: DataFrame): DataFrame = {
      // every node is `a` of some symmetric edge, so the join is inner
      val neighborMin = edges
        .join(l.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a"))
        .agg(min(col("label")).as("nmin"))
      l.join(neighborMin.select(col("a").as("node"), col("nmin")), "node")
        .select(
          col("node"),
          least(col("label"), col("nmin")).as("label"),
          (col("nmin") < col("label")).as("__chg"))
    }
    while (!converged && i < maxIter) {
      // The FIRST materialization chains TWO rounds into one plan and
      // one convergence count (r22): whenever any edge exists, round 1
      // provably changes a label (the larger endpoint of a pair always
      // shrinks), so a count after round 1 can never observe
      // convergence — it was a whole scheduled job spent learning
      // nothing (measured ~0.5 s/round on a 256-edge fixture at
      // sf0.1/32 cores, all planning/scheduling overhead; guide §2.6
      // fewer jobs). Convergence is judged by the LAST chained round's
      // __chg, which is exactly the per-round loop's meaning; on an
      // empty edge set both rounds are empty and the count still reads
      // 0. Later iterations stay single-step so maxIter keeps bounding
      // the total round count.
      val twoStep = i == 0 && maxIter >= 2
      val updatedPlan =
        if (twoStep) step(step(labels).select(col("node"), col("label")))
        else step(labels)
      // Local mode: LAZY checkpoint + count — the count job materializes
      // the round's checkpoint AND answers convergence, one job, not a
      // materialize job plus an isEmpty probe. Reliable mode: the
      // persist-across-write recipe (compute once; the convergence count
      // is then a cheap read of the checkpoint files).
      val updated =
        if (reliable) reliableCkpt(updatedPlan)
        else updatedPlan.localCheckpoint(eager = false)
      converged = updated.filter(col("__chg")).count() == 0
      prevRound.foreach(releaseCheckpoint) // superseded — release its blocks
      prevRound = Some(updated)
      labels = updated.select(col("node"), col("label"))
      i += (if (twoStep) 2 else 1)
    }
    def release(): Unit = { prevRound.foreach(releaseCheckpoint); releaseCheckpoint(edges) }
    // refuse to return an under-merged (wrong) component structure: a
    // path whose smallest ids sit at opposite ends needs diameter-many
    // rounds, and silently truncating at maxIter would retain
    // near-duplicates while still claiming transitive correctness
    if (!converged) {
      release()
      throw new IllegalStateException(
        s"collapseNearDups did not converge within $maxIter rounds — " +
          s"a component's diameter exceeds maxIter; raise it")
    }
    (labels, () => release())
  }

  /** Near-dup cluster report: one row per connected component of the
    * pair graph — `(cluster, size)` where `cluster` is the component's
    * minimum id — the dedup AUDIT view ("how big are my duplicate
    * families") that decides whether a corpus needs the boilerplate-
    * armored candidate order or a tighter threshold. Same propagation +
    * checkpoint hygiene as [[collapseNearDups]]; the size aggregate is
    * over the paired-member set (≪ corpus), singletons (unpaired docs)
    * are not rows. */
  def nearDupClusters(df: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val (labels, release) = componentLabels(pairs, maxIter, reliable)
    val reportPlan = labels
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("size"))
    val report =
      if (reliable) reliableCkpt(reportPlan) else reportPlan.localCheckpoint()
    release()
    report.orderBy(col("cluster"))
  }

  /** Cross-source duplication matrix: how many near-dup pairs link each
    * (unordered) pair of sources — the contamination view a corpus owner
    * actually asks for ("how much of source B is already in source A?").
    * Takes ANY pair set (exact, MinHash, SimHash…); sources are joined
    * on the bounded pair set (≪ corpus), the matrix aggregate is ∝
    * sources². Source pairs are canonicalized (least, greatest) so A–B
    * and B–A accumulate together; pairs within one source count too
    * (the diagonal). */
  def crossSourceMatrix(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      pairs: DataFrame): DataFrame = {
    val src = df.select(col(idCol), col(srcCol))
    pairs
      .join(src.select(col(idCol).as("id1"), col(srcCol).as("__s1")), "id1")
      .join(src.select(col(idCol).as("id2"), col(srcCol).as("__s2")), "id2")
      .select(
        least(col("__s1"), col("__s2")).as("source_a"),
        greatest(col("__s1"), col("__s2")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      // NULLS LAST to match SQL-engine default ordering of a NULL source
      .orderBy(col("source_a").asc_nulls_last, col("source_b").asc_nulls_last)
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH band join for
    * candidates (each vector emits `bands` keys), exact cosine verify.
    * The vector analog of [[minhashNearDupPairs]].
    *
    * `dedupCandidates` moves the duplicate-collapse BEFORE the verify
    * (distinct on the raw candidate pairs, skipping the post-filter
    * distinct) instead of after. Measured at the ScaleProbe ×8 tier
    * (sf0.1 embeddings ×8 = 256K vectors; see PLANS.md): post-verify
    * wins — the threshold kills almost every candidate so deduping
    * survivors is a near-empty shuffle, while pre-verify shuffles the
    * full candidate set to save only ~100-flop re-verifies of
    * multi-band duplicates. The flag stays for corpora where verify
    * dominates (much higher dim, or band settings that make candidate
    * multiplicity high). */
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with bounded-sample
    * spherical k-means, form exact-cosine duplicate pairs ONLY within a
    * cluster, collapse components keeping the minimum id. The clustering
    * is what makes semantic dedup tractable — pairs form inside buckets
    * of ~N/k vectors instead of across the corpus, so the pair stage is
    * O(Σ bucket²) with k scaled ∝ corpus to hold bucket size constant
    * (the same lever as IVF's nCentroids).
    *
    * Cluster-boundary duplicates are the known failure mode (a pair
    * straddling two clusters never meets): `nAssign` multi-assignment
    * closes it — every vector lands in its `nAssign` nearest buckets
    * ([[graft.functions.VectorKernels.nearestCentroids]]), so a
    * boundary pair meets unless ALL `nAssign` assignments disagree.
    * SimilaritySpec pins equality with the unbucketed collapse on both
    * a clustered fixture (nAssign = 1 suffices) and the near-random
    * driver fixture at the declared (k, nAssign). The declared
    * q_semdedup operating point (k=8, nAssign=4) was GRID-probed to
    * exact equality with the brute-force collapse at sf0.001/0.01/0.1 —
    * nAssign=3 is the measured minimum on the near-random fixture,
    * 4 adds margin — which is what lets the all-pairs
    * transitive-closure SQL serve as the oracle: full recall on the
    * fixture is part of the verified contract, not an aspiration.
    *
    * Scale shape: centroid training is driver-side over a bounded
    * sample (corpus-size-independent); assignment is one map-side
    * codegen pass (centroid table ships as a reference object);
    * candidates travel as bare (id1, id2) pairs — the bucket self-join
    * shuffles ids, never vectors ([[embeddingNearDupPairs]]'s posture);
    * vectors join back only for the exact-cosine verify; multi-bucket
    * candidate multiplicity (≤ nAssign) is deduped AFTER the threshold
    * kills most candidates, and the corpus is touched once by the final
    * collapse anti-join.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12): wall-ratio 1.53 at
    * ×8 with nClusters scaled ∝ rows (the operator's own lever —
    * probing a FIXED k at ×8 would measure the N²/k candidate
    * quadratic this design exists to avoid). */
  def semanticDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.9,
      nClusters: Int = 64,
      nAssign: Int = 4,
      sampleSize: Int = 2048,
      iters: Int = 10): DataFrame = {
    require(nAssign >= 1 && nAssign <= nClusters,
      s"nAssign=$nAssign must be in [1, nClusters=$nClusters]")
    val centroids =
      Similarity.trainCentroids(emb, idCol, vecCol, nClusters, sampleSize, iters)
    if (centroids.isEmpty) // no non-null vectors: nothing can pair, keep all
      return emb.select(col(idCol)).orderBy(col(idCol))
    val assigned = emb.select(
      col(idCol).as("id"),
      explode(
        graft.functions.native.nearestCentroids(col(vecCol), centroids, nAssign))
        .as("bucket"))
    collapseAssignedBuckets(emb, idCol, vecCol, threshold, assigned)
  }

  /** [[semanticDedup]] for corpora where nClusters ∝ rows makes the FLAT
    * path unaffordable at both ends — flat k-means training is
    * O(iters·sample·k·dim) on the driver and flat assignment O(rows·k·dim)
    * on the executors, a rows²/bucketSize wall once k tracks the corpus.
    * Here both go hierarchical: [[Similarity.trainCentroidsHier]] trains
    * coarseCells × finePerCell centroids at
    * O(iters·sample·(coarseCells+finePerCell)·dim), and each row is
    * assigned by the two-level kernel at
    * O((coarseCells + coarseProbes·finePerCell)·dim) — with
    * coarseCells ≈ finePerCell ≈ √k, that is ~√k·dim per row instead of
    * k·dim. Verification is UNCHANGED (exact cosine ≥ threshold on
    * candidate pairs, min-id collapse), so precision stays exact; what
    * the hierarchy trades is candidate RECALL at coarse-cell boundaries,
    * bought back with `coarseProbes` > 1 (a boundary-straddling pair
    * still shares a fine bucket if either side probes the other's cell —
    * the same escape nAssign provides within a level). With
    * `coarseProbes >= coarseCells` the kernel scans every fine centroid
    * in global order and assignment equals the flat kernel over the same
    * table bit-for-bit (spec-pinned), so the approximation has an exact
    * anchor. Measured (Scale64 r15, sf0.1 ×8→×64 octave at k ∝ rows,
    * train+assign stage): hier 0.24 → 0.41 s (octave 1.74, full
    * k = 8 281 trained) vs flat 0.38 → 1.62 s (octave 4.23 with k
    * CAPPED at 4096 — the flat trainer's budget cannot reach the
    * prescribed k at all, which is the wall's first symptom). */
  def semanticDedupHier(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.9,
      coarseCells: Int = 8,
      finePerCell: Int = 8,
      nAssign: Int = 4,
      coarseProbes: Int = 2,
      sampleSize: Int = 2048,
      iters: Int = 10): DataFrame = {
    // same REQUEST-level validation posture as the flat operator's
    // nAssign <= nClusters: parameters that are inconsistent on their
    // face fail fast. (The TRAINED model can still be smaller — sample
    // caps, empty cells — and the kernel clamps against it, exactly as
    // the flat kernel clamps n against its table.)
    require(nAssign >= 1 && nAssign <= coarseCells.toLong * finePerCell,
      s"nAssign=$nAssign must be in [1, coarseCells*finePerCell=${coarseCells.toLong * finePerCell}]")
    require(coarseProbes >= 1 && coarseProbes <= coarseCells,
      s"coarseProbes=$coarseProbes must be in [1, coarseCells=$coarseCells]")
    val model = Similarity.trainCentroidsHier(
      emb, idCol, vecCol, coarseCells, finePerCell, sampleSize, iters)
    if (model.isEmpty) // no non-null vectors: nothing can pair, keep all
      return emb.select(col(idCol)).orderBy(col(idCol))
    val assigned = emb.select(
      col(idCol).as("id"),
      explode(
        graft.functions.native.nearestCentroidsHier(
          col(vecCol), model.coarse, model.fine, model.fineCell, coarseProbes, nAssign))
        .as("bucket"))
    collapseAssignedBuckets(emb, idCol, vecCol, threshold, assigned)
  }

  /** The bucket→candidate→exact-verify→collapse tail [[semanticDedup]]
    * and [[semanticDedupHier]] share: within-bucket id pairs (id-only
    * shuffle), exact cosine verify at `threshold`, min-id component
    * collapse, survivors by id. */
  private def collapseAssignedBuckets(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      assigned: DataFrame): DataFrame = {
    // NOT merge-hinted (unlike the other candidate self-joins, r22 A/B):
    // the bucket key has only ~nClusters distinct values, so a forced
    // sort-merge join sorts a few huge groups (measured 1.60 → 1.91 s at
    // sf0.1/32 cores) while the assignment kernel the hint would save is
    // cheap; the AQE broadcast stays.
    val rawCands = assigned.select(col("bucket"), col("id").as("id1"))
      .join(assigned.select(col("bucket"), col("id").as("id2")), Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
    val pairs = rawCands
      .join(vecs.select(col("__id").as("id1"), col("__vec").as("v1")), "id1")
      .join(vecs.select(col("__id").as("id2"), col("__vec").as("v2")), "id2")
      .select(
        col("id1"), col("id2"),
        graft.functions.native.cosineSim(col("v1"), col("v2")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .select(col("id1"), col("id2"))
      .distinct()
    collapseNearDups(emb, idCol, pairs).select(col(idCol)).orderBy(col(idCol))
  }

  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.9,
      bands: Int = 16,
      bitsPerBand: Int = 8,
      dedupCandidates: Boolean = false,
      knownDim: Int = 0): DataFrame = {
    // knownDim skips the corpus-modal detection aggregate — repeated
    // invocations over one corpus detect once and pass it down (the
    // trainers' convention)
    val dim = if (knownDim > 0) knownDim else Similarity.detectDim(df, vecCol)
    if (dim == 0)
      return df.select(
        col(idCol).as("id1"), col(idCol).as("id2"), lit(0.0).as("cos_sim")).limit(0)
    // Candidates travel as bare (id1, id2) pairs — the band join shuffles
    // 16 bytes/row; vectors are joined back for the exact verify (the
    // same stage shape as minhashNearDupPairs/jaccardVerify). Candidate
    // dedup happens AFTER the cosine filter, not before: the threshold
    // kills almost every candidate, so deduping survivors is a
    // near-empty shuffle, while the old pre-verify `distinct` shuffled
    // the full candidate set (measured 1.5 M rows at sf0.1) just to
    // save re-verifying the multi-band duplicates (cosine on a
    // candidate is ~100 flops — far cheaper than shuffling it).
    val banded = df.select(
      col(idCol).as("id"),
      posexplode(
        graft.functions.native
          .hyperplaneSignatures(col(vecCol), bands, bitsPerBand, dim, seed = 1000)))
      .toDF("id", "band", "sig")
    // merge-hinted for exchange reuse: one hyperplane-signature pass
    // instead of two (see prefixFilterCandidatesHash)
    val rawCands = banded.select(col("band"), col("sig"), col("id").as("id1")).hint("merge")
      .join(banded.select(col("band"), col("sig"), col("id").as("id2")), Seq("band", "sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    val cands = if (dedupCandidates) rawCands.distinct() else rawCands
    val vecs = df.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
    val verified = cands
      .join(vecs.select(col("__id").as("id1"), col("__vec").as("v1")), "id1")
      .join(vecs.select(col("__id").as("id2"), col("__vec").as("v2")), "id2")
      .select(
        col("id1"),
        col("id2"),
        graft.functions.native.cosineSim(col("v1"), col("v2")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    if (dedupCandidates) verified else verified.distinct()
  }
}
