package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics over the event stream: funnel conversion and
  * cohort retention — the ksqlDB-style continuous aggregations' batch
  * complements, on the same epoch-nanos event table the windowing
  * operators use (`ts` is a nanos LONG via the nanos-as-long reader).
  *
  * Scale shape: both operators shuffle once on the analysis key
  * (user), reduce to per-user scalars or (user, day) pairs immediately
  * (map-side combined — events never re-shuffle), and finish with a
  * tiny aggregate ∝ steps or cohort-days. No windows over unpartitioned
  * data, no event-level joins.
  */
object EventAnalytics {

  /** Funnel depth per user, counted down the step list: a user is "at
    * depth i" when their event sequence — ordered by (ts, eventId), the
    * total order that makes same-nanosecond ties deterministic —
    * contains the first i step types as a subsequence. Returns one row
    * per step: (step, step_name, n_users) where n_users counts users
    * whose depth reaches that step, so the column is monotonically
    * non-increasing down the funnel.
    *
    * One shuffle, O(1) memory per user: events repartition by user and
    * SECONDARY-SORT within partitions on (user, ts, eventId), then a
    * partition-local streaming fold computes each user's depth as their
    * contiguous run flows past — no per-user array ever materializes,
    * so a hot user costs time, not aggregation-buffer memory (the
    * collect_list formulation this replaces spikes ∝ the hottest user).
    * The step histogram afterwards exchanges ≤ |steps| rows per
    * partition. `userCol`/`eventIdCol`/`tsCol` must be LONG (the
    * engine's event-table convention); the fold is the justified
    * mapPartitions case — per-partition imperative logic over a
    * secondary sort that no built-in aggregate expresses without
    * materializing the group.
    *
    * `maxSpan` (same unit as `tsCol`) bounds the WHOLE funnel to a
    * conversion window anchored at the user's FIRST step-1 event —
    * first-touch attribution, the standard product-analytics choice: a
    * later step-1 event never re-anchors, so "converted within an hour
    * of first viewing" means the first view. Default unbounded.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r10): wall-ratio 2.01 at
    * ×8. Skew adjudication (one user holding ~50% of events): the
    * hot-user corpus costs 1.4–1.69× the uniform one across rounds —
    * the hot user's run serializes into one task's sort+scan TIME
    * (bounded by ~0.5·cores in theory) and never into buffer memory,
    * which is the claim the O(1)-per-user fold makes. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      eventIdCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpan: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    require(maxSpan > 0, s"maxSpan must be positive: $maxSpan")
    val spark = events.sparkSession
    import spark.implicits._

    val depths = events
      .select(
        col(userCol).cast("long").as("user"),
        col(tsCol).cast("long").as("ts"),
        col(eventIdCol).cast("long").as("eid"),
        col(typeCol).cast("string").as("et"))
      // non-null contract: an event without a user/time/id cannot be
      // attributed to a funnel position. Dropping here (rather than
      // letting a NULL — original or a failed cast — NPE inside the
      // typed fold's encoder, or silently shift depths) pins the
      // semantics: such rows do not participate.
      .where(col("user").isNotNull && col("ts").isNotNull && col("eid").isNotNull)
      .repartition(col("user"))
      .sortWithinPartitions(col("user"), col("ts"), col("eid"))
      .as[(Long, Long, Long, String)]
      .mapPartitions { it =>
        new Iterator[(Long, Int)] {
          private var cur: (Long, Long, Long, String) = _
          private var has = it.hasNext
          if (has) cur = it.next()
          override def hasNext: Boolean = has
          override def next(): (Long, Int) = {
            val user = cur._1
            var depth = 0
            var anchor = 0L // ts of the first step-1 match (first touch)
            var sameUser = true
            while (has && sameUser) {
              if (cur._1 != user) sameUser = false
              else {
                if (depth < steps.size && cur._4 == steps(depth) &&
                  (depth == 0 || cur._2 - anchor <= maxSpan)) {
                  if (depth == 0) anchor = cur._2
                  depth += 1
                }
                if (it.hasNext) cur = it.next() else has = false
              }
            }
            (user, depth)
          }
        }
      }
      .toDF("user", "depth")

    val stepName = steps.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (w, (s, i)) => when(col("step") === (i + 1), s).otherwise(w)
    }
    val counts = depths
      // sequence(1, 0) would generate a DESCENDING [1, 0] — depth-0
      // users must not reach the explode at all
      .where(col("depth") >= 1)
      .select(explode(sequence(lit(1), col("depth"))).as("step"))
      .groupBy(col("step").cast("bigint").as("step"))
      .agg(count(lit(1)).as("n_users"))
    // a step nobody reaches still reports (with 0) — funnel reports
    // enumerate every step
    spark
      .range(1, steps.size + 1)
      .select(col("id").as("step"))
      .join(counts, Seq("step"), "left")
      .select(col("step"), stepName.as("step_name"), coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy(col("step"))
  }

  /** Classic cohort retention: users cohort by their first active day
    * (epoch-nanos floor-divided into days), and each (cohort_day,
    * day_offset) row counts how many of that cohort were active
    * day_offset days later. day_offset 0 is the cohort size itself.
    *
    * The event stream collapses to distinct (user, day) pairs in the
    * first map-side-combined aggregate — everything downstream is ∝
    * users × active-days, not events. The per-user first day joins back
    * broadcast-small under AQE. */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be non-negative: $maxOffsetDays")
    val dayNanos = 86400000000000L
    val userDays = events
      .select(col(userCol).as("user"), Windowing.floorDiv(col(tsCol), dayNanos).as("day"))
      .distinct()
    val cohorts = userDays.groupBy(col("user")).agg(min(col("day")).as("cohort_day"))
    userDays
      .join(cohorts, "user")
      .select(col("user"), col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .where(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Silence detection (batch half; [[graft.streaming.GapAlertStream]]
    * is the live dead-man's-switch): every consecutive-event gap per
    * key that exceeds `gapNs` — a stalled CDC connector, a dead device,
    * a churned user — as (key, gap_start_us, gap_end_us, gap_us),
    * ordered for the oracle.
    *
    * Shape: ONE per-key time-ordered window (lag) — the sessionization
    * sort, shared cost model with q_window_session; output ∝ gaps, not
    * events. Integer nanos arithmetic end to end, so the oracle match
    * is exact by construction. */
  /** First-order Markov transition matrix over each key's event-type
    * sequence: every consecutive (prev_type → next_type) pair, counted,
    * with the conditional probability `p = n_pairs / n_from` — the
    * behavioral model behind "what do users do after an error?" and the
    * sequence-sanity audit a pipeline runs on clickstream corpora.
    * Output: (prev_type, next_type, n_pairs, n_from, p), fully
    * enumerated over OBSERVED pairs, ordered.
    *
    * Shape: one per-key time-ordered window (lag) — the sessionization
    * sort — then a map-side-combined pair count whose exchange is
    * ∝ |types|², never events; the per-prev totals re-aggregate from
    * the COUNT table (|types|² rows) and broadcast back. Determinism:
    * counts are integers; `p` is one long/long IEEE division both
    * engines round identically. Ties at the same timestamp order by
    * `eventIdCol` — the engine's total-order convention.
    *
    * Measured (ScaleProbe, sf0.1 ×8 tiling, r12): wall-ratio 0.88–1.02
    * at ×8 — corpus-size-insensitive past the lag window, exactly the
    * ∝|types|² exchange claim. */
  def transitions(
      events: DataFrame,
      keyCol: String,
      tsNsCol: String,
      eventIdCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsNsCol), col(eventIdCol))
    val pairs = events
      .filter(col(keyCol).isNotNull && col(tsNsCol).isNotNull &&
        col(eventIdCol).isNotNull && col(typeCol).isNotNull)
      .select(col(keyCol), col(tsNsCol), col(eventIdCol), col(typeCol).as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
    val counts = pairs
      .groupBy(col("__prev").as("prev_type"), col("__t").as("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
    val totals = counts.groupBy(col("prev_type")).agg(sum(col("n_pairs")).as("n_from"))
    counts
      .join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n_pairs"), col("n_from"),
        (col("n_pairs").cast("double") / col("n_from")).as("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** RFM segmentation: per-user Recency (last-activity micros),
    * Frequency (event count), Monetary (exact value sum), each labeled
    * with its `nTiles`-quantile rank (tile 1 = most recent / most
    * frequent / highest spend) and combined into the classic
    * `r*100 + f*10 + m` segment code. The marketing-analytics staple
    * the reference's pull-query surface would serve.
    *
    * Shape: the event stream collapses to one row per user in a single
    * map-side-combined aggregate — everything after is ∝ DISTINCT
    * USERS, not events. The three ntile windows are deliberately
    * single-partition over that user axis (same cardinality-bound
    * posture as [[Relational.ksDrift]]'s distinct-value ECDF): users
    * are the entity axis, orders of magnitude below event count; a
    * 100 TB deployment with billions of users would swap the ntile for
    * a two-pass percentile-threshold join, which this output contract
    * (tile labels) already accommodates.
    *
    * Determinism: ntile is the SQL-standard earlier-buckets-larger
    * split over a TOTAL order (metric, then user id — ties broken);
    * monetary accumulates in DECIMAL(38,6) ([[Relational.exactSum]])
    * so both engines order identical doubles. */
  def rfm(
      events: DataFrame,
      userCol: String,
      tsNsCol: String,
      valueCol: String,
      nTiles: Int = 5): DataFrame = {
    // ≤ 9: the r·100+f·10+m segment code is positional decimal — a
    // two-digit tile would collide (r=1,f=12,m=1 ≡ r=2,f=2,m=1)
    require(nTiles >= 1 && nTiles <= 9, s"nTiles=$nTiles must be in [1, 9]")
    import org.apache.spark.sql.expressions.Window
    val per = events
      .filter(col(userCol).isNotNull && col(tsNsCol).isNotNull)
      .groupBy(col(userCol).as("user_id"))
      .agg(
        Windowing.floorDiv(max(col(tsNsCol)), 1000L).as("last_us"),
        count(lit(1)).as("frequency"),
        Relational.exactSumDouble(col(valueCol)).as("monetary"))
    def tile(metric: Column) = ntile(nTiles).over(
      Window.orderBy(metric.desc, col("user_id").asc))
    per
      .select(col("user_id"), col("last_us"), col("frequency"), col("monetary"),
        tile(col("last_us")).as("r_tile"),
        tile(col("frequency")).as("f_tile"),
        tile(col("monetary")).as("m_tile"))
      .withColumn("segment",
        (col("r_tile") * 100 + col("f_tile") * 10 + col("m_tile")).cast("int"))
      .orderBy(col("user_id"))
  }

  /** Event-time disorder audit: per key, how many events arrive (in
    * `seqCol` order — the offset/arrival axis) with an event time
    * BEHIND the key's running maximum, and by how much at worst — THE
    * measurement behind choosing a `withWatermark` delay (the delay
    * must cover max_late or the streaming operators drop data; zero
    * disorder everywhere means offset order can stand in for time
    * order, which is exactly what this engine's fixture audit shows).
    * Output per key: (key, n_events, n_regressions, max_late_us —
    * NULL when the key is perfectly ordered).
    *
    * Shape: ONE per-key seq-ordered window (running max over the
    * preceding frame — the q_gaps sort axis) collapsing straight into
    * a per-key aggregate; output ∝ keys. Integer nanos arithmetic end
    * to end — the oracle match is structural. */
  def disorderAudit(
      events: DataFrame,
      keyCol: String,
      tsNsCol: String,
      seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = col("__prevmax").isNotNull && col("__ts") < col("__prevmax")
    events
      .filter(col(keyCol).isNotNull && col(tsNsCol).isNotNull && col(seqCol).isNotNull)
      .select(col(keyCol), col(tsNsCol).cast("long").as("__ts"), col(seqCol))
      .withColumn("__prevmax", max(col("__ts")).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(late, 1L).otherwise(0L)).as("n_regressions"),
        max(when(late,
          Windowing.floorDiv(col("__prevmax") - col("__ts"), 1000L))).as("max_late_us"))
      .orderBy(col(keyCol))
  }

  /** Silence detection: per-key lag window over event time, emitting
    * one row per inter-event gap above the threshold — output ∝ gaps,
    * one per-key sort (the q_window_session axis).
    *
    * Measured (r11 ScaleProbe, sf0.1 ×8 tiling): 1.82 at ×8. */
  def gaps(
      events: DataFrame,
      keyCol: String,
      tsNsCol: String,
      gapNs: Long): DataFrame = {
    require(gapNs > 0, s"gapNs must be positive: $gapNs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"))
    events
      .filter(col(keyCol).isNotNull && col(tsNsCol).isNotNull)
      .select(col(keyCol), col(tsNsCol).cast("long").as("__ts"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .filter(col("__ts") - col("__prev") > gapNs)
      .select(
        col(keyCol),
        Windowing.floorDiv(col("__prev"), 1000L).as("gap_start_us"),
        Windowing.floorDiv(col("__ts"), 1000L).as("gap_end_us"),
        Windowing.floorDiv(col("__ts") - col("__prev"), 1000L).as("gap_us"))
      .orderBy(col(keyCol), col("gap_start_us"))
  }
}
