package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single most recent
  * right row of the same key at or before the left row's time. The classic
  * trades/quotes enrichment every event-analytics stack needs and Spark has
  * no built-in for (extension surface; the reference's join family stops at
  * stream-table equi-joins).
  *
  * Spark-first shape — the union + running-`last` formulation, NOT a range
  * join: tag both sides, union them, and carry the latest right payload
  * forward inside one per-key time-ordered window. Costs exactly ONE
  * shuffle of (left + right) by key and one per-key sort — there is no
  * (left × right-within-interval) intermediate at any point, so a key with
  * L probes and R reference rows does O((L+R) log(L+R)) work instead of
  * the O(L·R) a naive inequality join does. At 100 TB both sides stream
  * through the same exchange; per-key volume is the only skew axis (same
  * axis as any keyed window — AQE cannot split a window partition, so a
  * pathologically hot key needs key-salting with per-salt boundary
  * handoff, which this operator does not attempt).
  *
  * Tie semantics (pinned, deterministic, mirrored by the oracle): a right
  * row AT the left row's exact time matches (`<=`); among right rows with
  * equal (key, time) the one with the greatest `rightTieBreak` wins —
  * right rows sort before left rows at equal time and `last()` keeps the
  * final non-null payload in sort order, so no pre-dedup aggregate is
  * needed. Left rows with no prior right row keep NULL payload columns
  * (left outer).
  */
object AsOfJoin {

  /** @param keys          equi-join key columns, same names on both sides
    * @param timeCol       event-time column, same name on both sides (any
    *                      orderable type; callers here use epoch micros)
    * @param rightTieBreak right column breaking ties among equal
    *                      (key, time) right rows — greatest wins
    * @param rightCols     right payload columns to carry onto the output
    *                      (must not collide with left column names)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightTieBreak: String,
      rightCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == timeCol)
    // collide against EVERY output column the left side contributes —
    // keys included — and against rightCols itself: a key-named right
    // payload column (or a repeated rightCols entry) previously passed
    // this guard and emitted duplicate output columns, failing only
    // downstream with AMBIGUOUS_REFERENCE (r20 review finding)
    require(
      rightCols.intersect(leftPayload ++ keys :+ timeCol).isEmpty,
      s"right payload columns ${rightCols.mkString(",")} must not collide with left columns")
    require(rightCols.distinct.size == rightCols.size,
      s"right payload columns repeat a name: ${rightCols.mkString(",")}")

    val l = left.select(
      (keys :+ timeCol).map(col) ++ Seq(
        struct(leftPayload.map(col): _*).as("__l"),
        lit(null).cast(right.select(col(rightTieBreak)).schema.head.dataType).as("__tie"),
        lit(1).as("__side")): _*)
    val r = right.select(
      (keys :+ timeCol).map(col) ++ Seq(
        struct(rightCols.map(col): _*).as("__r"),
        col(rightTieBreak).as("__tie"),
        lit(0).as("__side")): _*)
    // right rows sort BEFORE left rows at equal time (side 0 < 1) so a
    // same-instant right row is visible to the left row (`<=` semantics);
    // the tiebreak makes the running `last` deterministic under equal
    // (key, time) right rows
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col(timeCol)) ++
          leftPayload.map(c => col("__l").getField(c).as(c)) ++
          rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** The hot-key escape hatch the base operator's Scaladoc names: AQE
    * cannot split a window partition, so a key holding a macroscopic
    * fraction of the LEFT side serializes on one task. This flavor
    * salts with the replicate-right/split-left scheme that needs NO
    * per-salt boundary handoff: left rows scatter over `salts`
    * sub-partitions by a deterministic row hash, right rows are
    * REPLICATED into every salt — each (key, salt) window therefore
    * contains the key's FULL right history, and the per-left-row answer
    * is exactly the unsalted one (equality pinned by AsOfJoinSpec,
    * including equal-time tie rows).
    *
    * Cost model: the exchange grows by (salts−1)×|right| replicated
    * rows in return for splitting each key's window sort `salts` ways —
    * the right trade exactly when a hot key's LEFT volume dominates
    * (the trades≫quotes regime this join exists for). A key hot on the
    * RIGHT side gains nothing (every salt still sorts the full right
    * history); that regime should instead pre-compact the right side
    * (e.g. keep the per-(key, time) winner by `rightTieBreak` first,
    * which is semantics-preserving by the tie rule).
    *
    * Measured (ScaleProbe skew adjudication, sf0.1 ×8, one user holding
    * ~50% of events): unsalted hot-key costs 1.1–1.5× the uniform
    * corpus, salts=8 lands 0.95–2.2× of unsalted across rounds — the
    * crossover sits where hot-key left volume outweighs the
    * (salts−1)×|right| replication, exactly the cost model above; on
    * the fixture tiers the unsalted plan usually wins, so salting stays
    * the documented ESCAPE HATCH, not the default. */
  def asOfJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightTieBreak: String,
      rightCols: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1")
    require(!(left.columns ++ right.columns).contains("__salt"),
      "input must not carry a __salt column")
    // deterministic per-row scatter (content hash, not RNG: retries and
    // re-runs land every row on the same salt). Hash only the columns
    // Spark's hash() accepts — MapType (e.g. the events table's props
    // column) is rejected at analysis time, and this hatch exists
    // precisely for that hot-key regime. keys+timeCol always
    // participate; hashable payload columns spread rows that share
    // (key, time). Fully-identical left rows share a salt — harmless
    // for correctness (output equality is salt-independent) and only a
    // skew concern if one exact row repeats macroscopically.
    val hashable = left.schema.fields
      .filter(f => keys.contains(f.name) || f.name == timeCol || isHashable(f.dataType))
      .map(f => col(f.name))
    val l = left.withColumn(
      "__salt", pmod(hash(hashable.toSeq: _*), lit(salts)).cast("int"))
    val r = right.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    asOfJoin(l, r, keys :+ "__salt", timeCol, rightTieBreak, rightCols)
      .drop("__salt")
  }

  /** Spark's `hash()` rejects MapType anywhere in the type — the shared
    * [[HashableType]] predicate (one copy across the ops package). */
  private def isHashable(dt: org.apache.spark.sql.types.DataType): Boolean =
    HashableType.isHashable(dt)
}
