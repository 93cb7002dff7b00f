package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables — the co-located-join half of the
  * 100 TB join playbook, complementing `broadcast()` for small dims:
  * write each fact table ONCE bucketed by its join key, and every later
  * equi-join on that key runs WITHOUT an exchange on either side — the
  * shuffle is paid at write time, amortized over every join that reads
  * the table (reference analog: Kafka topic partitioning co-locates the
  * changelog by key so ksqlDB joins are shuffle-free; bucketing is the
  * lake-side equivalent).
  *
  * Mechanics: `bucketBy(n, key)` hashes rows into `n` files per
  * partition writer and records the layout in the catalog; at read
  * time Spark's scan reports a HashPartitioning(key, n) output
  * partitioning, so the join planner skips both Exchanges when the two
  * sides' bucket specs line up (same count, keys = join keys).
  * `sortBy(key)` additionally pre-orders within buckets so sort-merge
  * join can skip its sorts when applicable.
  *
  * The catalog is required (bucket metadata lives there, not in
  * parquet), so tables register in the session catalog with an explicit
  * external `path` — droppable, and the data sits where the caller
  * says, not a hidden warehouse. At 1000 executors the win is exactly
  * the brief's: the biggest recurring shuffle in the pipeline
  * disappears from EVERY downstream join/aggregation keyed the same
  * way. */
object Bucketed {

  /** Bucket count for a layout write, sized from the table's row count:
    * `⌈rows / targetRowsPerBucket⌉`, floored at `floor`, CAPPED at
    * `maxBuckets`. This is the production lever both scale probes
    * measured (ScaleProbe 2d, ×8; Scale64, ×64): a FIXED bucket count
    * makes the per-bucket sort super-linear in the data (11–14× at ×8,
    * compounding to 25× over an 8× octave as buckets spill), while
    * buckets ∝ rows keeps per-bucket volume — and therefore the join's
    * per-task cost — constant, measuring linear-to-sub-linear on the
    * same data. The default target (64 Ki rows/bucket) keeps a bucket's
    * sort comfortably in-memory for the fact-table row widths here ON
    * THE LOCAL FIXTURE'S 8 GiB driver-as-executor; both join sides must
    * be written with the SAME resulting count (size from the LARGER
    * side) or the co-location silently degrades to a shuffled join.
    *
    * Why the cap exists: `⌈rows/64Ki⌉` extrapolated to ~100 TB
    * (~10¹² rows) prescribes ~15 M buckets — at ≥1 file per bucket
    * that is a ≥15 M-file listing/metastore posture no catalog enjoys
    * (bucket metadata is per-table, but scan planning still lists and
    * tracks every file, and small files kill read throughput). Past
    * the cap the RIGHT lever is `targetRowsPerBucket` growing with the
    * table: real executors carry 16–64 GiB, so a per-bucket sort stays
    * in-memory at targets far above the local-fixture 64 Ki default
    * (the `maxBuckets` default of 65 536 puts ~15 M rows ≈ 1.5 GiB per
    * bucket at 10¹² rows — in-memory on any production executor). The
    * cap implements exactly that: when it binds, the EFFECTIVE target
    * becomes ⌈rows/maxBuckets⌉ and per-bucket volume resumes growing
    * linearly with the table, which is the documented trade at the file
    * -count ceiling, not a silent one.
    *
    * Cross-version note: the cap changes the computed count ONLY above
    * ~4.3e9 rows at the default target (needed > 65 536). A layout
    * WRITTEN above that scale by a pre-cap build carries the uncapped
    * count, so re-deriving one join side under the cap would break the
    * both-sides-same-count rule above (correct but shuffled, the
    * documented degradation). When refreshing one side of an existing
    * co-located pair, use [[bucketsForPartner]] with the partner's
    * recorded bucket count (the catalog has it), not a fresh
    * bucketsFor call. When the cap BINDS, this method says so on
    * stderr (r19 advisor finding: a silent cap leaves the
    * effective-target shift invisible at the one moment a layout
    * decision is being made). */
  def bucketsFor(
      rows: Long,
      targetRowsPerBucket: Long = 65536L,
      floor: Int = 8,
      maxBuckets: Int = 65536): Int = {
    require(targetRowsPerBucket > 0 && floor > 0,
      s"targetRowsPerBucket=$targetRowsPerBucket floor=$floor must be positive")
    require(maxBuckets >= floor,
      s"maxBuckets=$maxBuckets must be >= floor=$floor")
    val needed = (rows + targetRowsPerBucket - 1) / targetRowsPerBucket
    if (needed > maxBuckets) System.err.println(
      s"bucketsFor: cap binds (needed=$needed > maxBuckets=$maxBuckets); " +
        s"effective rows/bucket rises to ~${rows / maxBuckets.toLong} " +
        s"(requested $targetRowsPerBucket). If this table joins a layout " +
        "written by a pre-cap build, size to the partner's recorded " +
        "bucket count (bucketsForPartner) or the join degrades to a " +
        "shuffled one.")
    math.max(floor.toLong, needed).min(maxBuckets.toLong).toInt
  }

  /** Bucket count for REFRESHING one side of an existing co-located
    * pair: the partner table's RECORDED count is authoritative — the
    * no-Exchange join requires both sides to carry the SAME count, so
    * any fresh [[bucketsFor]] derivation (different target, a
    * different cap across versions, a grown row count) silently
    * degrades the pair to a shuffled join. Reads the partner's bucket
    * spec from the session catalog and fails LOUDLY when the partner
    * is not bucketed (writing an arbitrary count next to a flat table
    * co-locates nothing) or when the partner's bucket COLUMNS are not
    * its side of the join (matching counts hashed by different keys
    * keep both Exchanges — the same silent degradation by another
    * door; r20 review finding); the method exists to make the sizing
    * rule a named code path instead of a scaladoc caution (r19
    * advisor finding).
    *
    * @param partnerJoinKeys the partner table's join key column(s) —
    *        the columns its side of the equi-join uses, which must be
    *        exactly what the partner's layout is hashed by. */
  def bucketsForPartner(
      spark: SparkSession,
      partnerTable: String,
      partnerJoinKeys: Seq[String]): Int = {
    require(partnerJoinKeys.nonEmpty, "partnerJoinKeys must name the join key column(s)")
    val ident = spark.sessionState.sqlParser
      .parseTableIdentifier(partnerTable)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    meta.bucketSpec match {
      case Some(spec) =>
        val have = spec.bucketColumnNames.map(_.toLowerCase)
        val want = partnerJoinKeys.map(_.toLowerCase)
        require(have == want,
          s"partner table '$partnerTable' is bucketed by (${spec.bucketColumnNames.mkString(", ")}), " +
            s"not the join key(s) (${partnerJoinKeys.mkString(", ")}) in that ORDER — matching " +
            "its bucket COUNT would not co-locate this join (Spark only elides the exchanges " +
            "when both sides' bucket columns equal their join keys, sequence included: the " +
            "hash is over the column tuple in bucket-spec order, so the same key set in a " +
            "different order hashes rows differently); pass partnerJoinKeys in the partner's " +
            "bucket-column order, re-layout the partner, or accept a shuffled join")
        spec.numBuckets
      case None => throw new IllegalArgumentException(
        s"partner table '$partnerTable' has no bucket spec in the " +
          "catalog — it is not a co-located layout; write it with " +
          "writeBucketedTable first (or size this side with bucketsFor " +
          "and accept a shuffled join)")
    }
  }

  /** Write `df` as an external bucketed table: `buckets` files per
    * writer task, hashed and sorted by `keyCol`, registered as `name`
    * at `path` (overwriting any previous registration of the name). */
  def writeBucketedTable(
      df: DataFrame,
      name: String,
      path: String,
      keyCol: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Equi-join two bucketed tables on their bucket keys. When both
    * sides were written with the SAME bucket count on these keys, the
    * executed plan carries NO Exchange — BucketedJoinSpec pins that;
    * a mismatched layout silently degrades to a normal shuffled join
    * (correct, just not free), which is the right failure mode for a
    * layout drift.
    *
    * Measured (ScaleProbe adjudication 2d, sf0.1 ×8, r12): at a FIXED
    * 8-bucket layout the steady-state join grows 11–14× at ×8 data
    * (per-bucket sort is O(n log n) at constant bucket count — the
    * honest super-linearity of a frozen layout); with buckets scaled
    * ∝ table size (8 → 64, per-bucket volume constant, layout write
    * untimed as the amortized one-off) it grows 4.3–8.3× ≈ linear
    * across runs. Bucket-count scaling is the production lever.
    *
    * Second octave (graft.Scale64, ×8 → ×64, r14): the frozen layout's
    * penalty COMPOUNDS — 25.35 where linear is 8.0 (3.2× over linear
    * vs 1.4× on the first octave; per-bucket sorts hit 4.8M rows and
    * spill) — while the scaled layout (64 → 512 buckets) measures
    * 4.98, sub-linear on the same data. Two octaves of measurement
    * behind the lever, not one. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    // dataset-qualified keys: with `col(...)` a SAME-NAMED key on both
    // sides (the natural co-located layout) resolves ambiguously and
    // the join fails analysis
    l.join(r, l(leftKey) === r(rightKey))
  }
}
