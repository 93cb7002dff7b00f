package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin, typed wrappers for the reference's relational surface
  * (SURVEY.md §2.1 A2/B2, C3, D1-D4, D7): projection with the ksqlDB
  * uppercase-rename quirk, point lookup, counts, top-N, union-of-counts,
  * grouped aggregation, struct keys, null guards.
  *
  * All of these lower to single Catalyst operators; filters and projections
  * land in the parquet scan (PushedFilters / ReadSchema), aggregates get
  * partial map-side combine. Nothing here shuffles more than once.
  */
object Relational {

  /** Projection that mirrors ksqlDB's field-name uppercasing
    * (reference: README.md:227-233 — `pk.fields=ID`, not `id`). */
  def projectUpper(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => col(c).as(c.toUpperCase)): _*)

  /** Point pull query (`SELECT * FROM t WHERE k = v`,
    * TOMBSTONE_HANDLING_GUIDE.md:188-190). Equality predicate is pushed to
    * the parquet scan → row-group + page skipping via min/max stats. */
  def pointLookup(df: DataFrame, keyCol: String, value: Any): DataFrame =
    df.filter(col(keyCol) === lit(value))

  /** `SELECT COUNT(*) AS total` — parquet metadata-only at scan time. */
  def countAll(df: DataFrame, as: String = "total"): DataFrame =
    df.agg(count(lit(1)).as(as))

  /** Deterministic top-N: total order imposed before LIMIT. Spark plans
    * this as TakeOrderedAndProject — per-partition top-N then a k-row merge
    * on the driver, no full sort, no full shuffle. */
  def topN(df: DataFrame, n: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(n)

  /** Per-table row counts unioned (reference: purge-source-db.sh:77-83).
    * Each branch is a metadata-cheap count; union of single-row frames. */
  def unionCounts(tables: Seq[(String, DataFrame)]): DataFrame =
    tables
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("cnt")).select(lit(name).as("tbl"), col("cnt"))
      }
      .reduce(_ unionAll _)
      .orderBy(col("tbl"))

  /** Grouped count+sum (reference: the-whole-thing.sh:91-94 offset sums).
    * Sums over floating-point columns go through DECIMAL(38,6) so results
    * are exact and independent of partitioning / aggregation order — a
    * correctness property, not just an oracle convenience: a plan that only
    * matches the oracle under one partitioning is not reproducible at scale.
    */
  def groupAgg(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("cnt"),
        exactSumDouble(col(valueCol)).as("sum_value"))
      // explicit NULLS LAST: a NULL group is a real group (no filter
      // above) and DuckDB asc defaults NULLS LAST — the FIXTURES.md rule
      .orderBy(col(groupCol).asc_nulls_last)

  /** Hierarchical subtotals via ROLLUP: per-(a,b), per-a, and grand
    * total in one pass — Catalyst expands to a single aggregate over the
    * grouping-set union, so partial combine still applies per set.
    * `gset` is the standard grouping id (bit per dim, leftmost most
    * significant): it tells a SUBTOTAL's NULL apart from a genuine NULL
    * dimension value, without which two rows could share every sort key
    * yet carry different counts — an engine-dependent row order. */
  def rollupCounts(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), exactSumDouble(col(valueCol)).as("sum_value"),
        grouping_id().as("gset"))

  /** Full cross-dimensional subtotals via CUBE — [[rollupCounts]] with
    * every dimension SUBSET (rollup keeps only prefixes): per-(a,b),
    * per-a, per-b, and the grand total in one aggregate over the
    * grouping-set union, so map-side partial combine still applies per
    * set and output is ∝ Σ set cardinalities, never rows. `gset` as in
    * [[rollupCounts]] — CUBE's extra (NULL, b) set doubles the
    * subtotal-vs-NULL-value ambiguity surface it resolves. */
  def cubeCounts(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), exactSumDouble(col(valueCol)).as("sum_value"),
        grouping_id().as("gset"))

  /** Exact per-group distribution shape: mean, population variance,
    * skewness, and excess kurtosis — the audit behind "is this metric's
    * distribution even roughly what the sampler assumes?" (a long tail
    * shows as skew, heavy outlier mass as kurtosis, long before a
    * histogram is read). Raw moments Σv..Σv⁴ accumulate EXACTLY in
    * DECIMAL(38,6) ([[exactSum]] — order-independent), and every
    * derived quantity is the same fixed sequence of +,−,×,÷,√ on
    * identical doubles in engine and oracle — all correctly-rounded
    * IEEE, no transcendentals, so the match is bit-for-bit with no
    * rounding step. |v| < 1e5 bounds each v⁴ term at 1e20, leaving
    * DECIMAL(38,6)'s ~1e32 capacity ≥1e12 rows of per-group headroom
    * (the earlier 1e7 bound left only 1e4 rows before the Σv⁴ decimal
    * itself overflowed — Spark non-ANSI sums NULL, DuckDB errors);
    * out-of-bound rows leave count and sums TOGETHER, the zOutliers
    * posture. Zero-variance groups emit NULL shape (the division
    * guard), mirroring zOutliers/madOutliers.
    *
    * Scale shape: ONE map-side-combined aggregate (exchange ∝ groups ×
    * 4 decimals); everything after is a ≤|groups|-row projection. */
  def groupMoments(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val finite = v.isNotNull && !isnan(v) && abs(v) < lit(1e5)
    val mean = col("__s1") / col("__n")
    val r2 = col("__s2") / col("__n")
    val r3 = col("__s3") / col("__n")
    val r4 = col("__s4") / col("__n")
    val m2 = r2 - mean * mean
    val m3 = r3 - lit(3.0) * mean * r2 + lit(2.0) * mean * mean * mean
    val m4 = r4 - lit(4.0) * mean * r3 + lit(6.0) * mean * mean * r2 -
      lit(3.0) * mean * mean * mean * mean
    df.filter(finite)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("__n"),
        exactSum(v).cast("double").as("__s1"),
        exactSum(v * v).cast("double").as("__s2"),
        exactSum(v * v * v).cast("double").as("__s3"),
        exactSum(v * v * v * v).cast("double").as("__s4"))
      .select(
        col(groupCol),
        col("__n").as("n_rows"),
        mean.as("mean"),
        m2.as("variance"),
        when(m2 > 0, m3 / (m2 * sqrt(m2))).as("skewness"),
        when(m2 > 0, m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
      // explicit NULLS LAST: a NULL group is a real group here (no
      // NULL filter above), and Spark asc defaults NULLS FIRST while
      // DuckDB defaults NULLS LAST — the FIXTURES.md ordering rule
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** Per-class evaluation of a prediction column against ground truth:
    * (class, support, predicted, tp, precision, recall, f1) — the
    * model-eval report a pipeline runs on every classifier gate it
    * trusts (language-ID vs labeled lang, quality verdict vs curated
    * labels). The class spine is the UNION of true and predicted
    * labels, so a class that is only ever predicted (e.g. 'unknown')
    * or only ever true still reports; degenerate denominators emit
    * NULL (never-predicted → NULL precision, never-true → NULL recall,
    * p+r = 0 → NULL f1) rather than a fake 0.
    *
    * Scale shape: one map-side-combined (label, pred) cell count —
    * exchange ∝ distinct pairs, never rows — then marginal re-aggs of
    * the CELL table and ≤|classes|-row joins (the chi2 posture).
    * Counts are exact longs; precision/recall are single IEEE
    * divisions and f1 one fixed sequence — bit-identical to the
    * oracle, no rounding step. */
  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cells = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("__l"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    // ONE pass over the ≤classes² cell table (r22): each cell
    // contributes its count to its label-class's support (and tp when
    // on the diagonal) and to its prediction-class's predicted — one
    // explode + one aggregate. The previous shape derived support /
    // predicted / tp as three separate aggregates over `cells` joined
    // full_outer + left, which re-executed the whole upstream
    // prediction pipeline (an expensive per-doc scoring kernel in both
    // callers) once per branch: the tp branch's pushed-down diagonal
    // filter makes its subtree canonically unequal, so runtime exchange
    // reuse could not collapse them (measured 3 corpus kernel passes in
    // q_langid_clf's final adaptive plan; guide §1.2 don't compute
    // twice). A class appearing only as a label or only as a
    // prediction still gets its row — it contributes via its side of
    // the explode, exactly like the old full_outer.
    val contribs = cells.select(explode(array(
      struct(col("__l").as("class"), col("__n").as("__s"), lit(0L).as("__pc"),
        when(col("__l") === col("__p"), col("__n")).otherwise(lit(0L)).as("__t")),
      struct(col("__p").as("class"), lit(0L).as("__s"), col("__n").as("__pc"),
        lit(0L).as("__t")))).as("e"))
      .select(col("e.class").as("class"), col("e.__s").as("__s"),
        col("e.__pc").as("__pc"), col("e.__t").as("__t"))
    val sup = col("__support_c")
    val pred = col("__predicted_c")
    val precision = when(pred > 0, col("__tp_c").cast("double") / pred)
    val recall = when(sup > 0, col("__tp_c").cast("double") / sup)
    contribs
      .groupBy(col("class"))
      .agg(sum(col("__s")).as("__support_c"),
        sum(col("__pc")).as("__predicted_c"),
        sum(col("__t")).as("__tp_c"))
      .select(col("class"),
        col("__support_c").as("support"),
        col("__predicted_c").as("predicted"),
        col("__tp_c").as("tp"),
        precision.as("precision"),
        recall.as("recall"),
        when(precision + recall > 0,
          lit(2.0) * precision * recall / (precision + recall)).as("f1"))
      .orderBy(col("class"))
  }

  /** Deterministic top-N rows per group: rank by the given order within
    * each partition key and keep ranks ≤ n. A window sort per group —
    * unlike global [[topN]] there is no TakeOrdered shortcut, but the
    * sort is per-key and skew-managed by AQE. Ties must be broken by the
    * caller's order columns for determinism. */
  def topNPerGroup(df: DataFrame, n: Int, partitionCols: Seq[String], order: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** Exact per-group DISCRETE quantiles: for each probability `p` the
    * value at 1-based sorted rank `⌊p·(n−1)⌋ + 1` (p=0 → min, p=1 → max;
    * always an actual data value, no interpolation — which is what keeps
    * the result type the input type and the contract engine-exact: rank
    * arithmetic is integer + one identically-rounded IEEE multiply,
    * unlike interpolating quantiles whose blend `a + (b−a)·f` vs
    * `a·(1−f) + b·f` differ by an ulp across engines). Tied values make
    * the row_number assignment arbitrary but the value AT a rank
    * deterministic, so no tiebreak column is needed.
    *
    * One shuffle by group + per-key window sort — the honest cost of
    * EXACT quantiles (same skew axis as [[topNPerGroup]]). At 100 TB
    * prefer `approx_percentile` (t-digest sketch, map-side combinable,
    * no per-key sort) when a bounded rank error is acceptable; this
    * operator is the exact/oracle-checkable form.
    */
  /** Column labels are `p${round(p*100)}` — two ps that round to the
    * same integer (0.5 and 0.504) would emit duplicate column names and
    * make the checked harness's `_lo`/`_hi`/`_approx` lookups resolve
    * ambiguously, so every quantile entry point rejects them up front. */
  private[graft] def requireDistinctQuantileLabels(ps: Seq[Double]): Unit = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val labels = ps.map(p => (p * 100).round)
    require(labels.distinct.size == labels.size,
      s"percentiles $ps collide after p*100 rounding: labels $labels")
  }

  def groupQuantilesDisc(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    requireDistinctQuantileLabels(ps)
    import org.apache.spark.sql.expressions.Window
    // quantiles are over NON-NULL values (the standard contract; it also
    // sidesteps the engines' opposite default NULL sort positions —
    // Spark ASC is NULLS FIRST, SQL engines commonly NULLS LAST)
    val ranked = df
      .select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = ps.map { p =>
      val name = s"p${(p * 100).round}"
      max(when(col("__rk") === floor(lit(p) * (col("__n") - 1)) + 1, col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Verification harness for the [[profileApprox]] swap-in: exact
    * stats plus `distinct_ok` — the HLL++ estimate must land within
    * `tol` of the exact distinct count. The sketches live in their own
    * zero-key aggregate, NEVER inside a multi-distinct aggregate: under
    * Spark's multi-distinct rewrite every non-distinct aggregate —
    * including each column's HLL sketch (thousands of buffer words at
    * rsd 1%) — is instantiated PER DISTINCT-TUPLE GROUP, so that
    * combined form materializes |distinct tuples| × |cols| full sketch
    * buffers and exchanges them (measured ~160 s vs ~4 s at sf0.1).
    * Since r21 the exact side shares [[profile]]'s split shape (one
    * stats aggregate + per-column distinct aggregates) and the basic
    * stats are computed ONCE — the previous form ran the full exact
    * AND full approx profiles and joined them, paying every decimal
    * sum twice (4.65 s → ~1.3 s at sf0.1/32 cores). */
  def profileApproxChecked(
      df: DataFrame,
      cols: Seq[String],
      rsd: Double = 0.01,
      tol: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileApproxChecked needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    // r21: the basic stats (n / nulls / min / max / exact sum) compute
    // ONCE — the pre-r21 form ran the full exact profile AND the full
    // approx profile and joined them, paying every decimal sum twice
    // (measured 4.65 s → ~1.2 s at sf0.1/32 cores). Each column's
    // distinct set feeds BOTH the exact count and the HLL++ sketch in
    // one aggregate: the sketch's registers are max-folds of value
    // hashes, so duplicates are no-ops and the estimate over distinct
    // values is BIT-IDENTICAL to the estimate over all rows — while
    // the rsd-1% sketch's ~1.6K-word buffer update (measured 2.5 s
    // over all rows vs 0.24 s for every other stat combined) now runs
    // on |distinct| rows only. profileApprox (the swap-in itself) keeps
    // its one-pass shape: at 100 TB a second pass is the scan cost the
    // sketch exists to avoid; this harness is the sf-sized yardstick.
    val one = joinExactDistincts(profileStatsAgg(df, cols), df, cols,
      // binary-buffer HLL++ (r22, graft.functions.HllBinary): identical
      // estimate via Spark's own HyperLogLogPlusPlusHelper, but ONE
      // BinaryType buffer field instead of ~rsd⁻² flattened LONG buffer
      // attributes — the built-in's 1 639-column buffer schema at rsd 1%
      // cost ~0.6 s of per-execution planning/codegen PER COLUMN,
      // independent of row count (StageProbe8/10)
      c => Seq(graft.functions.HllBinary.approxCountDistinct(col(c), rsd)
        .as(s"${c}__approx")))
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"),
        col(s"${c}__sum").as("sum_val"),
        (abs(col(s"${c}__approx") - col(s"${c}__distinct"))
          <= col(s"${c}__distinct").cast("double") * lit(tol)).as("distinct_ok"))
    }
    one
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** The 100 TB flavor of [[groupQuantilesDisc]]: `percentile_approx`
    * (Greenwald-Khanna sketch at `accuracy`) per group in ONE hash
    * aggregate — map-side-combinable sketch state, NO per-key window
    * sort, so the per-group cost is O(values) regardless of skew (the
    * exact path's hot-group sort axis disappears). The sketch's
    * guarantee is a RANK error ≤ n/accuracy, which is what
    * [[groupQuantilesApproxChecked]] verifies against the exact values.
    * Deterministic for a given dataset (GK compression is
    * content-driven, not sampled).
    *
    * Measured (r10 ScaleProbe, sf0.1 ×8 tiling): 0.82 at ×8 — the KLL
    * sketch aggregate is corpus-size-insensitive at this tier. */
  def groupQuantilesApprox(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    requireDistinctQuantileLabels(ps)
    require(accuracy >= 1, s"accuracy must be positive: $accuracy")
    val aggs = ps.map { p =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}_approx")
    }
    df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Verification harness for the [[groupQuantilesApprox]] swap-in (the
    * q_profile_approx pattern): emits the EXACT discrete quantiles (the
    * hash-matchable yardstick) plus one `approx_ok` column asserting
    * every sketch estimate lies between the exact values at ranks
    * `target ± (⌈n/accuracy⌉ + 2)` — the sketch's rank guarantee with
    * +2 slack for the discrete-vs-sketch target-rank convention
    * difference (`⌊p·(n−1)⌋+1` here vs the sketch's `p·n`). A sketch
    * drifting past its bound turns the row red under the driver gate.
    * Computes the exact path as the sf-sized yardstick; the swap-in
    * itself ([[groupQuantilesApprox]]) never does. */
  def groupQuantilesApproxChecked(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    requireDistinctQuantileLabels(ps)
    import org.apache.spark.sql.expressions.Window
    val approx = groupQuantilesApprox(df, groupCol, valueCol, ps, accuracy)
    // ONE ranking window feeds both the exact quantiles and the rank
    // bounds (the exact value IS max(when(rk = target)) over the same
    // ranking [[groupQuantilesDisc]] builds) — the per-group sort is
    // the harness's dominant cost and must not run twice
    val ranked = df
      .select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val slack = ceil(col("__n").cast("double") / lit(accuracy.toDouble)).cast("long") + lit(2L)
    val statAggs = ps.flatMap { p =>
      val name = s"p${(p * 100).round}"
      val target = floor(lit(p) * (col("__n") - 1)) + 1
      Seq(
        max(when(col("__rk") === target, col(valueCol))).as(name),
        max(when(col("__rk") === greatest(target - slack, lit(1L)), col(valueCol)))
          .as(s"${name}_lo"),
        max(when(col("__rk") === least(target + slack, col("__n")), col(valueCol)))
          .as(s"${name}_hi"))
    }
    val stats = ranked.groupBy(col(groupCol)).agg(statAggs.head, statAggs.tail: _*)
    val names = ps.map(p => s"p${(p * 100).round}")
    val ok = names
      .map(n => col(s"${n}_approx").between(col(s"${n}_lo"), col(s"${n}_hi")))
      .reduceLeft(_ && _)
    stats
      .join(approx, groupCol)
      .select(col(groupCol) +: names.map(col) :+ ok.as("approx_ok"): _*)
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** TPC-H-Q1-shaped pricing summary: the canonical scan-heavy OLAP
    * aggregate — per (returnflag, linestatus): row count, exact sums of
    * quantity / base price / discounted price / discounted+taxed charge,
    * and the average quantity.
    *
    * Scale shape: ONE pass over the fact table; the derived measures
    * (`price·(1−disc)`, `·(1+tax)`) are per-row projections inside
    * whole-stage codegen, the aggregate combines map-side to ≤ 6 groups
    * per partition, and the exchange carries 6 rows of decimals — the
    * scan is the entire cost at any corpus size.
    *
    * Exactness: products evaluate in DOUBLE (IEEE, identical across
    * engines for the same expression shape) and accumulate via
    * [[exactSum]]'s DECIMAL(38,6) (order-independent); the average is
    * one IEEE division of exact parts ([[exactAvgLong]] convention). */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        exactSumDouble(col("l_quantity")).as("sum_qty"),
        exactSumDouble(col("l_extendedprice")).as("sum_base_price"),
        exactSumDouble(discPrice).as("sum_disc_price"),
        exactSumDouble(charge).as("sum_charge"),
        (exactSum(col("l_quantity")).cast("double") / count(col("l_quantity")))
          .as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact decimal sum of a double column — deterministic under any
    * aggregation order (double sums are not associative; decimal sums are).
    *
    * NaN/±Infinity are mapped to NULL before the decimal cast: under ANSI
    * mode (pinned on in [[graft.GraftSession.configure]])
    * `CAST(NaN AS DECIMAL)` throws, which would make the aggregate a
    * data-dependent crash; treating non-finite as "no value" matches the
    * sink-side `behavior.on.null.values=ignore` posture of the reference
    * (start-sink-connector.sh:81) and is a no-op on finite data.
    */
  def exactSum(c: Column): Column =
    // the CASE WHEN + CAST formulation this replaced spent ~70% of the
    // aggregate's time inside Cast's Double.toString/BigDecimal.valueOf
    // per-row route (r21 measurement: 0.70 s vs 0.19 s plain-double for
    // four sums over sf0.1 lineitem); the compiled kernel produces the
    // identical decimal (DecimalKernelProps) with the non-finite→NULL
    // guard folded in
    sum(graft.functions.native.exactDecimal6(c))

  /** [[exactSum]] emitted as DOUBLE: the accumulation stays exact and
    * order-independent, but the *output* column is a canonically-hashable
    * primitive. One final cast of the same exact decimal is deterministic,
    * so Spark and the DuckDB oracle computing
    * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)` agree on all tested
    * scales (a 1-ulp divergence is conceivable once the scaled sum exceeds
    * 2^53; the driver hash has never shown one — revisit if it does). */
  def exactSumDouble(c: Column): Column = exactSum(c).cast("double")

  /** Exact average: integral sum then a single IEEE division — identical
    * on any engine, unlike incrementally-accumulated `avg`. */
  def exactAvgLong(c: Column): Column =
    sum(c).cast("double") / count(c)

  /** Null/NaN-safe guard (reference: `behavior.on.null.values=ignore`,
    * start-sink-connector.sh:81). */
  def nullGuard(c: Column): Column =
    c.isNotNull && !isnan(c)

  /** Per-column data-quality profile over numeric columns: one output
    * row per column with non-null count, null count, exact distinct
    * count, min/max (as DOUBLE), and the exact decimal-accumulated sum
    * ([[exactSumDouble]] — order-independent, so engines agree).
    *
    * Plan shape (r21 rewrite): ONE zero-key stats aggregate (count /
    * nulls / min / max / exact sum — no Expand) cross-joined with one
    * narrow two-level distinct aggregate PER column (map-side distinct
    * per partition → exchange of distinct values only → count). The
    * multi-distinct single-agg form this replaced planned as Expand —
    * row volume ×(|cols|+1) materialized as 17-field rows through one
    * hash aggregate keyed on all |cols| value columns at once — and
    * measured 2.91 s vs 0.84 s for this form at sf0.1/32 cores. The
    * trade is |cols|+1 column-pruned scans instead of one |cols|-wide
    * scan (each reads exactly one column's pages, so total bytes read
    * ≈ 2× the old single scan) against |cols|× less hash-aggregate row
    * volume on 8-byte keys instead of 40-byte ones; the exchanges carry
    * the same distinct values either way. Exact distinct counts remain
    * the honest cost center — [[profileApprox]] is the declared,
    * oracle-gated 100 TB swap-in (its HLL sketch needs no distinct
    * exchange at all). Output is ∝ columns, never data. */
  /** The basic (non-distinct) per-column stats in ONE zero-key
    * aggregate — shared by [[profile]] and [[profileApproxChecked]] so
    * the checked harness never pays the scan twice. */
  private def profileStatsAgg(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        exactSumDouble(col(c)).as(s"${c}__sum"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Each column's EXACT distinct count as its own two-level aggregate
    * (map-side distinct per partition → exchange of distinct values →
    * count), cross-joined onto `base` one 1-row frame at a time.
    * GroupBy normalizes NaN/−0.0 exactly like countDistinct, so the
    * counts are identical to the multi-distinct plan's. `extraAggs`
    * lets [[profileApproxChecked]] ride its HLL++ sketch on the same
    * per-column distinct aggregate instead of duplicating the fold
    * (r22, ADVICE: one copy, so a future NULL/NaN normalization fix
    * cannot drift between the exact and checked profiles). */
  private def joinExactDistincts(
      base: DataFrame,
      df: DataFrame,
      cols: Seq[String],
      extraAggs: String => Seq[Column] = _ => Seq.empty): DataFrame =
    cols.foldLeft(base) { (acc, c) =>
      acc.crossJoin(
        df.select(col(c)).where(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as(s"${c}__distinct"), extraAggs(c): _*))
    }

  private def profileUnpivot(one: DataFrame, cols: Seq[String], distinctName: String): DataFrame = {
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as(distinctName),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"),
        col(s"${c}__sum").as("sum_val"))
    }
    one
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    profileUnpivot(
      joinExactDistincts(profileStatsAgg(df, cols), df, cols), cols, "n_distinct")
  }

  /** The 100 TB flavor of [[profile]]: identical shape except the exact
    * `countDistinct` becomes `approx_count_distinct` (HyperLogLog++ at
    * relative standard deviation `rsd`) in `n_distinct_approx`. The
    * plan difference is the point — the exact multi-distinct plans as
    * Expand (row volume ×|cols|), the sketch is ONE ordinary hash
    * aggregate pass whose state is |cols| fixed-size HLL registers, so
    * the scan cost stays flat no matter how many columns are profiled
    * (PlanSpec pins the no-Expand shape). The estimate is
    * deterministic for a given dataset (HLL++ is content-hashed, not
    * sampled); q_profile_approx pins its error against the exact count
    * under the driver's oracle gate. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "profileApprox needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        // binary-buffer HLL++ — same estimate, flat buffer schema (see
        // profileApproxChecked)
        graft.functions.HllBinary.approxCountDistinct(col(c), rsd)
          .as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        exactSumDouble(col(c)).as(s"${c}__sum"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct_approx"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"),
        col(s"${c}__sum").as("sum_val"))
    }
    one
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Pivot aggregate (cross-tab): one row per `groupCol`, one column per
    * DECLARED pivot value, each cell the exact decimal sum of `valueCol`
    * ([[exactSumDouble]]) for that (group, pivot) pair; absent pairs are
    * NULL.
    *
    * `values` is EXPLICIT and required: Spark's value-less `pivot()`
    * first runs a distinct-values job and collects it to the driver —
    * an extra full scan plus an unbounded driver collect at 100 TB.
    * With declared values the plan is ONE scan and one ≤|groups|-row
    * exchange (map-side partials per group, |values| cells each), and
    * the output schema is static — the same reasons the reference's
    * cross-tabs declare their columns.
    *
    * Measured (r11 ScaleProbe, sf0.1 ×8 tiling): 1.40 at ×8 — declared-
    * value cross-tab, exchange ∝ groups. */
  def pivotAgg(
      df: DataFrame,
      groupCol: String,
      pivotCol: String,
      values: Seq[String],
      valueCol: String): DataFrame = {
    require(values.nonEmpty, "pivotAgg needs declared pivot values")
    require(values.distinct.size == values.size, s"duplicate pivot values: $values")
    df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(exactSumDouble(col(valueCol)))
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** Fixed-width histogram of `valueCol` over [lo, hi): `n` equal
    * buckets, every bucket emitted (zero-count included), values ≥ hi
    * clamped into the last bucket, values < lo dropped. Output:
    * (bucket, bucket_lo, bucket_hi, n_rows).
    *
    * Determinism: bucket = floor((x−lo)/width) with lo/width as DOUBLE
    * literals — one subtraction, one division, one floor, all
    * correctly-rounded IEEE ops every engine computes bit-identically
    * (no transcendentals). Edges are a DESIGN choice, not noise: a
    * value exactly on a boundary lands in the upper bucket on every
    * engine.
    *
    * Scale shape: one scan, map-side combine to ≤ n cells per task, an
    * n-row exchange, then a broadcast join against the n-row bucket
    * spine (`spark.range`) to surface empty buckets — output ∝ n,
    * never data.
    *
    * Measured (r11 ScaleProbe, sf0.1 ×8 tiling): 1.19 at ×8 — ≤n-cell
    * aggregate plus broadcast spine. */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      n: Int): DataFrame = {
    require(n > 0 && hi > lo, s"need n>0 and hi>lo, got n=$n [$lo,$hi)")
    val width = (hi - lo) / n
    val x = col(valueCol).cast("double")
    val bucket = least(
      floor((x - lit(lo)) / lit(width)).cast("long"), lit(n.toLong - 1L))
    // finite-only: +inf would clamp into the last bucket via Spark's
    // non-ANSI cast while DuckDB's CAST(floor('inf')) errors — the
    // exactSum finite-guard posture, mirrored in the oracle
    val counts = df
      .filter(x.isNotNull && !isnan(x) &&
        x >= lit(lo) && x < lit(Double.PositiveInfinity))
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    val spine = df.sparkSession.range(n.toLong).withColumnRenamed("id", "bucket")
    spine
      .join(broadcast(counts), Seq("bucket"), "left")
      .select(
        col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("bucket_hi"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .orderBy(col("bucket"))
  }

  /** Per-group z-score outliers: rows whose value deviates from the
    * group mean by more than `z` sample standard deviations. Output:
    * (group, id, value, zscore), ordered by group then id.
    *
    * Determinism: the moments accumulate EXACTLY ([[exactSum]]'s
    * DECIMAL(38,6) for Σx and Σx², order-independent), and everything
    * after is +,−,×,÷,√ on identical doubles — all correctly-rounded
    * IEEE, so Spark and the oracle agree bit-for-bit (the reason this
    * does NOT use the engine's incremental `stddev_samp`, whose
    * accumulation order varies). Sample variance is the textbook
    * (Σx² − (Σx)²/n)/(n−1) on the exact parts.
    *
    * Scale shape: two scans of (group, value) — a ≤|groups|-row exact
    * aggregate, broadcast back, then a stateless filter projection; no
    * per-group sort, no window. Skewed groups cost nothing beyond their
    * row count. */
  /** Exact two-sample Kolmogorov–Smirnov statistic between the
    * distributions of `valueCol` in `dfA` and `dfB` — the
    * distribution-drift gate a pipeline runs between corpus
    * generations / sources / time slices before trusting a mixture.
    * One row: (n_a, n_b, n_values, ks_stat) where
    * `ks = max_x |F_A(x) − F_B(x)|` over every observed value.
    *
    * Scale shape: each side collapses to (value, count) — exchanges ∝
    * DISTINCT values, never rows — then one full-outer merge of the two
    * count tables and a running-sum window over the distinct-value axis.
    * That window is deliberately single-partition: the ECDF prefix is a
    * global order, and |distinct| is the metric's cardinality (n_chars,
    * token counts: thousands), not the corpus. A truly-continuous
    * metric at 100 TB would first quantize to a fixed grid (the
    * standard ECDF-on-bins KS) to keep that axis bounded.
    *
    * Determinism: counts are integers; F_A, F_B are single divisions of
    * longs and the max-of-abs-differences is exact IEEE on identical
    * inputs — engine and oracle agree bit-for-bit.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r11/r13): wall-ratio
    * 0.58–1.02 at ×8 — cardinality-bound, corpus-size-insensitive at
    * this tier. */
  def ksDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, side: String) = df
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("v")).agg(count(lit(1)).as(side))
    val merged = counts(dfA, "ca").join(counts(dfB, "cb"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = merged.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("n_values"))
    merged
      .select(
        sum(col("ca")).over(w).as("cum_a"),
        sum(col("cb")).over(w).as("cum_b"))
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("n_values"),
        // an EMPTY side (n=0) must yield NULL ks_stat, guarded BEFORE
        // the division runs: under ANSI (the Spark 4 default) cum/0
        // throws DIVIDE_BY_ZERO, and with ANSI off it was a silent NaN
        // that max() sorted above every real statistic — either way a
        // drift gate comparing ks_stat <= t never learned that one
        // side had no finite values. NULL is the honest no-comparison
        // verdict; the counts still name WHICH side was empty (r20
        // review finding; both-empty yields zero rows, same posture)
        when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
          .otherwise(abs(col("cum_a").cast("double") / col("n_a")
            - col("cum_b").cast("double") / col("n_b"))).as("d"))
      .groupBy(col("n_a"), col("n_b"), col("n_values"))
      .agg(max(col("d")).as("ks_stat"))
  }

  /** Per-group z-score outliers: one map-side-combined stats aggregate
    * broadcast back onto the scan — a filter, not a window, so the
    * corpus is read twice but never re-shuffled.
    *
    * Measured (r11 ScaleProbe, sf0.1 ×8 tiling): 1.44 at ×8. */
  def zOutliers(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      z: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    // finite values only, in COUNT and sums alike: a NaN/±Inf row must
    // not be half-counted (in n but nulled out of exactSum's guarded
    // accumulation), which would skew the mean every finite row is
    // classified against. The bound is on v AND v*v: a finite v with
    // |v| > ~1.3e154 squares to +Inf, and a too-large square leaves
    // DECIMAL(38,6) — either way exactSum would null the square out of
    // __sumsq while the row stayed in __n. |v| < 1e10 keeps v*v ≤ 1e20,
    // leaving DECIMAL(38,6)'s ~1e32 capacity ≥1e12 rows of per-group
    // headroom for the ACCUMULATED Σv² (the groupMoments arithmetic —
    // the earlier 1e15 bound left only ~10² max-magnitude rows before
    // the summed decimal itself overflowed, despite claiming 1e17);
    // rows beyond the bound are excluded from stats and classification
    // alike, mirrored in the oracle
    val finite = v.isNotNull && !isnan(v) && abs(v) < lit(1e10)
    val variance = (col("__sumsq") - col("__sum") * col("__sum") / col("__n")) /
      (col("__n") - 1)
    val stats = df
      .filter(finite)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("__n"),
        exactSum(v).cast("double").as("__sum"),
        exactSum(v * v).cast("double").as("__sumsq"))
      .withColumn("__mean", col("__sum") / col("__n"))
      // no-sample-variance groups get NULL sd and never classify:
      // singletons (the n−1 division would throw under ANSI) AND
      // zero-variance groups — without the `> 0` guard an all-equal
      // group divides by sd=0, and Spark orders NaN/±Inf ABOVE any
      // threshold, flagging every row of a constant group as an outlier
      .withColumn("__sd", when(col("__n") > 1 && variance > 0, sqrt(variance)))
      .select(col(groupCol), col("__mean"), col("__sd"))
    df.filter(finite)
      .join(broadcast(stats), groupCol)
      .withColumn("zscore", (v - col("__mean")) / col("__sd"))
      .filter(abs(col("zscore")) > lit(z))
      .select(col(groupCol), col(idCol), v.as("value"), col("zscore"))
      .orderBy(col(groupCol).asc_nulls_last, col(idCol))
  }

  /** Robust per-group anomalies: rows whose `|value − median|` exceeds
    * `k` × the group's median absolute deviation — the outlier gate that
    * survives what breaks [[zOutliers]] (one extreme row inflates a
    * mean/sd enough to hide itself; medians don't move). Both medians
    * are the DISCRETE rank statistic ([[groupQuantilesDisc]]'s value at
    * rank `⌊(n−1)/2⌋+1` — engines agree exactly; an interpolated median
    * blends two doubles and diverges by ulps), the deviation is one
    * double subtraction and the gate one multiply + compare — all
    * correctly-rounded IEEE on identical operands, so engine and oracle
    * CLASSIFY identically. Zero-MAD groups (majority-constant values)
    * classify nothing — same posture as zOutliers' zero-variance guard;
    * without it every non-modal row of a near-constant group would flag.
    *
    * Shape (r21 rewrite): two per-group window sorts (values, then
    * deviations — the q_quantiles skew axis, bounded per group), each
    * carrying its median to EVERY row in the same windowed pass
    * (row_number + count + max-when-at-rank over one sort). The
    * aggregate-then-broadcast-join-back form this replaced evaluated
    * the deviation frame twice (once to feed the MAD aggregate, once
    * for the final gate) and paid two join stages — measured 0.74 s vs
    * 0.45 s for this form at sf0.1/32 cores; the rank arithmetic is
    * identical, so classification is unchanged. */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val finite = v.isNotNull && !isnan(v) && abs(v) < lit(Double.PositiveInfinity)
    // value-at-rank ⌊(n−1)/2⌋+1 over one per-group sort, delivered to
    // every row of the group by an unbounded-frame max — the same
    // discrete-median arithmetic as groupQuantilesDisc (ties make the
    // row_number assignment arbitrary but the value AT the rank
    // deterministic)
    def withMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val wOrd = Window.partitionBy(groupCol).orderBy(col(c))
      val wAll = Window.partitionBy(groupCol)
      in.withColumn("__rk", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn(out, max(when(
          col("__rk") === floor(lit(0.5) * (col("__n") - 1)) + 1, col(c))).over(wAll))
        .drop("__rk", "__n")
    }
    val rows = df.filter(finite).select(col(groupCol), col(idCol), v.as("__v"))
    val dev = withMedian(rows, "__v", "__med")
      .withColumn("__dev", abs(col("__v") - col("__med")))
    withMedian(dev, "__dev", "__mad")
      .filter(col("__mad") > 0 && col("__dev") > lit(k) * col("__mad"))
      .select(col(groupCol), col(idCol), col("__v").as("value"),
        col("__dev").as("abs_dev"), col("__mad").as("mad"))
      .orderBy(col(groupCol).asc_nulls_last, col(idCol))
  }

  /** Heavy-hitter audit: the `topK` keys by row count, each with its
    * share of ALL rows and the running cumulative share — the
    * operational query run BEFORE choosing a partitioning (is this key
    * set skewed enough to salt? how much of the table do the top 20
    * keys own?). One map-side-combined count aggregate (exchange ∝
    * distinct keys), a one-row total broadcast, TakeOrderedAndProject
    * top-k; the cumulative window runs over the K RESULT rows only
    * (single partition of K, not a corpus sort). Shares divide exact
    * BIGINT counts — cum_share divides the exact CUMULATIVE count, not
    * a float running sum, so both engines emit identical doubles.
    * Ties at the cut break by key (NULLS LAST) — deterministic. */
  /** Pearson chi-squared test of independence between two categorical
    * columns — the corpus audit behind "is language independent of
    * source?" (a skewed lang×source association is how one bad crawl
    * poisons a mixture). One row:
    * (n_rows, n_a, n_b, dof, chi2) with
    * `chi2 = Σ_cells (observed − expected)² / expected` over the FULL
    * a×b grid (structural zeros included — the textbook statistic, not
    * the observed-cells shortcut that understates association).
    *
    * Scale shape: one map-side-combined cell count (exchange ∝
    * |a|×|b| distinct pairs, never rows), two marginal re-aggregates of
    * that cell table, and a broadcast-broadcast cross of the marginals
    * to enumerate the grid — every post-scan frame is
    * cardinality-bound. No corpus self-join, no window.
    *
    * Determinism: counts are integers; `expected` is two IEEE ops on
    * exact longs; each cell's contribution rounds to 6 decimals before
    * accumulating in DECIMAL(38,6) ([[exactSum]]'s order-independent
    * posture), so engine and oracle agree bit-for-bit.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12/r13): wall-ratio
    * 0.68–1.07 at ×8 — the scan is the only thing that grows. */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowT = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
    val colT = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__nb"))
    val tot = cells.agg(sum(col("__n")).as("__nt"))
    val expected = col("__na").cast("double") * col("__nb") / col("__nt")
    val observed = coalesce(col("__n"), lit(0L)).cast("double")
    val contrib = round(
      (observed - expected) * (observed - expected) / expected, 6)
    broadcast(rowT)
      .crossJoin(broadcast(colT))
      .crossJoin(broadcast(tot))
      .join(cells, Seq("__a", "__b"), "left")
      .agg(
        max(col("__nt")).as("n_rows"),
        count_distinct(col("__a")).as("n_a"),
        count_distinct(col("__b")).as("n_b"),
        exactSum(contrib).cast("double").as("__chi2"))
      .select(col("n_rows"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        col("__chi2").as("chi2"))
  }

  /** Population Stability Index between two samples of a numeric
    * metric over a declared fixed-bin grid — the monitoring companion
    * to [[ksDrift]]: KS answers "did the distribution move?", PSI
    * answers "by how much, industry-calibrated" (< 0.1 stable, > 0.25
    * act). One row: (n_a, n_b, n_buckets, psi) with
    * `psi = Σ_buckets (p_a − p_b) · ln(p_a / p_b)` on
    * Laplace-smoothed shares `p = (c + 0.5) / (n + 0.5·buckets)` —
    * smoothing makes empty buckets finite on both sides, the standard
    * fix.
    *
    * Bucketing follows [[histogram]]'s edge semantics exactly
    * (floor((x−lo)/width), ≥hi clamps into the last bucket, <lo
    * drops) so the two operators audit the same grid.
    *
    * Scale shape: each side collapses to ≤ n bucket counts map-side
    * (exchange ∝ buckets, never rows), merged on the broadcast n-row
    * spine. The declared fixed grid is what keeps a truly-continuous
    * metric cardinality-bound at 100 TB — the quantize-first posture
    * [[ksDrift]]'s scaladoc prescribes, built in here.
    *
    * Determinism: counts are integers, shares are single IEEE
    * divisions, and each bucket's term rounds to 6 decimals before the
    * DECIMAL(38,6) accumulation — the established `round(ln(·),6)`
    * posture that absorbs the engines' 1-ulp `ln` divergence.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12/r13): wall-ratio
    * 0.80–0.94 at ×8 — ≤n-bucket aggregates, corpus-size-insensitive
    * at this tier. */
  def psiDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      n: Int): DataFrame = {
    require(n > 0 && hi > lo, s"need n>0 and hi>lo, got n=$n [$lo,$hi)")
    val width = (hi - lo) / n
    val x = col(valueCol).cast("double")
    val bucket = least(
      floor((x - lit(lo)) / lit(width)).cast("long"), lit(n.toLong - 1L))
    // finite-only, the histogram posture: +inf would clamp into the
    // last bucket on Spark but error DuckDB's CAST — excluded both sides
    def counts(df: DataFrame, side: String) = df
      .filter(x.isNotNull && !isnan(x) &&
        x >= lit(lo) && x < lit(Double.PositiveInfinity))
      .select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(side))
    val spine = dfA.sparkSession.range(n.toLong).withColumnRenamed("id", "bucket")
    val merged = spine
      .join(broadcast(counts(dfA, "ca")), Seq("bucket"), "left")
      .join(broadcast(counts(dfB, "cb")), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = merged.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val pa = (col("ca") + lit(0.5)) / (col("n_a") + lit(0.5 * n))
    val pb = (col("cb") + lit(0.5)) / (col("n_b") + lit(0.5 * n))
    merged
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        round((pa - pb) * log(pa / pb), 6).as("__term"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_buckets"),
        exactSum(col("__term")).cast("double").as("psi"))
      .select(col("n_a"), col("n_b"), col("n_buckets"), col("psi"))
  }

  /** k-anonymity audit over quasi-identifier columns: every
    * combination whose group is smaller than `k` — the privacy check a
    * corpus publisher runs BEFORE release (a (lang, source) cell with 3
    * documents re-identifies its authors in a way a 5 000-document cell
    * does not; k-anonymity, Sweeney 2002). Output: the risky
    * combinations with their sizes, ordered — empty means the corpus
    * passes at this `k`.
    *
    * Shape: one map-side-combined count aggregate (exchange ∝ distinct
    * quasi-combinations, never rows) then a stateless size filter —
    * output ∝ risky combos. Integer counts end to end: the oracle
    * match is structural. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit needs at least one quasi-identifier")
    require(k >= 2, s"k=$k must be >= 2 (k=1 flags nothing)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)
      .orderBy(quasiCols.map(c => col(c).asc_nulls_last): _*)
  }

  /** [[heavyHitters]] plus a live audit of its 100 TB swap-in: one
    * Misra–Gries sketch ([[graft.functions.MisraGries]], capacity
    * counters per partial — exchange ∝ capacity instead of distinct
    * keys) runs beside the exact aggregate, and each exact top-k row
    * carries `sketch_ok`: the estimate is within the ⌊n/(capacity+1)⌋
    * undercount bound AND every key heavy enough that the theory
    * guarantees capture is present. Both are THEOREMS of the sketch
    * (Misra–Gries 1982; mergeability Agarwal et al. 2012), so the
    * booleans are deterministically TRUE and the raw merge-order-
    * dependent estimates never reach the output — the
    * profileApproxChecked posture exactly: the declared row verifies
    * the swap-in, production uses the sketch alone.
    *
    * Domain: NULL keys are excluded from BOTH sides (the sketch cannot
    * count them, and an exact NULL-key group heavier than the MG bound
    * would otherwise flip sketch_ok to false through no fault of the
    * sketch) — unlike [[heavyHitters]], whose NULL group is a real
    * group. Shares here therefore divide the non-NULL total. */
  def heavyHittersChecked(
      df: DataFrame,
      keyCol: String,
      topK: Int,
      capacity: Int): DataFrame = {
    val nonNull = df.filter(col(keyCol).isNotNull)
    val exact = heavyHitters(nonNull, keyCol, topK)
    val sketch = nonNull
      .agg(
        graft.functions.MisraGries.mgSketch(col(keyCol), capacity).as("__sk"),
        count(lit(1)).as("__n"))
    val bound = expr(s"__n div ${capacity + 1}")
    val matches = filter(col("__sk"),
      e => e.getField("key") === col(keyCol).cast("string"))
    // a key evicted from the sketch has no match — ANSI element_at
    // throws on the empty array, so the absence must be NULL explicitly
    val est = when(size(matches) > 0,
      element_at(matches, 1).getField("est"))
    val under = col("n_rows") - est
    val withinBound = when(est.isNotNull, under >= 0 && under <= bound)
      .otherwise(col("n_rows") <= bound)
    val capturedWhenGuaranteed = !(col("n_rows") > bound) || est.isNotNull
    exact
      .crossJoin(broadcast(sketch))
      .select(col(keyCol), col("n_rows"), col("share"), col("cum_share"),
        (withinBound && capturedWhenGuaranteed).as("sketch_ok"))
      .orderBy(col("n_rows").desc, col(keyCol).asc_nulls_last)
  }

  /** Measured (ScaleProbe, sf0.1 ×8 tiling, r12): wall-ratio 0.96 at
    * ×8 (exact agg ∝ distinct keys + the K-row window — corpus-size-
    * insensitive at this tier); the checked sketch pairing
    * ([[heavyHittersChecked]]) measures 1.08. */
  def heavyHitters(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    val order = Seq(col("n_rows").desc, col(keyCol).asc_nulls_last)
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .orderBy(order: _*)
      .limit(topK)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("n_rows"),
        (col("n_rows").cast("double") / col("__total")).as("share"),
        (sum(col("n_rows")).over(w).cast("double") / col("__total")).as("cum_share"))
      .orderBy(order: _*)
  }
}
