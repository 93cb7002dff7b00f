package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment joins (north-star extension; the reference's only multi-table
  * op is UNION ALL — SURVEY.md §2.1 D4 — so joins are part of the port's
  * added surface, modeled on ksqlDB stream-table joins).
  *
  * Scale doctrine:
  *  - dimension tables (nation, region: ≤ a few thousand rows at any SF)
  *    are ALWAYS broadcast — no shuffle of the fact side on their account;
  *  - fact-to-midsize joins (orders ⋈ customer) are left to Catalyst+AQE:
  *    at small SF AQE converts them to broadcast at runtime, at 100 TB they
  *    become shuffle joins partitioned on the key — correct either way
  *    without code changes.
  */
/** Spark's hash expressions reject MapType anywhere in a type (maps
  * have no canonical entry order); everything else is hashable. ONE
  * shared predicate — [[Joins.saltedJoin]], [[AsOfJoin]]'s salted
  * variant, and [[Similarity]]'s spread-write salt all select their
  * hash columns through it, so the recursion cannot drift per caller
  * (r20 review finding: two private copies existed). */
private[ops] object HashableType {
  import org.apache.spark.sql.types._
  def isHashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case a: ArrayType => isHashable(a.elementType)
    case s: StructType => s.fields.forall(f => isHashable(f.dataType))
    case _ => true
  }
}

object Joins {

  /** Skew-safe equi-join for when AQE's runtime skew splitting isn't
    * enough (e.g. one key is half the fact table): the fact side gets a
    * deterministic salt in [0, salts), the (small) build side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — the hot key's rows spread over `salts` reducers
    * instead of one. Replication multiplies the build side by `salts`,
    * so this is for genuinely small/medium build sides; result rows are
    * identical to the unsalted join.
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      factKey: String,
      buildKey: String,
      salts: Int): DataFrame = {
    require(salts >= 1)
    // hash only the HASHABLE fact columns: Spark's hash functions
    // reject MapType at analysis time, and the skew escape hatch must
    // not throw on exactly the map-carrying event tables it exists for
    // (r20 review finding). The key column always qualifies — an
    // equi-join key can't be a map — so the struct is never empty.
    val saltSrc = fact.schema.fields
      .filter(f => HashableType.isHashable(f.dataType))
      .map(f => col(f.name))
    val saltedFact = fact.withColumn(
      "__graft_salt",
      pmod(xxhash64(struct(saltSrc.toSeq: _*)), lit(salts)).cast("int"))
    val replicatedBuild = build.withColumn(
      "__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact
      .join(
        replicatedBuild,
        saltedFact(factKey) === replicatedBuild(buildKey) &&
          saltedFact("__graft_salt") === replicatedBuild("__graft_salt"))
      .drop("__graft_salt")
  }

  /** Keyed interval-count join: for each left row, how many right rows of
    * the same key fall in the half-open time window
    * `(leftTime + lower, leftTime + upper]`. ("errors in the 60 minutes
    * before each purchase" — the windowed-enrichment shape a naive
    * inequality join turns into a per-key cross product.)
    *
    * Scale shape — BUCKETED range join: both sides are bucketed by
    * `width = upper − lower`; a right row lands in exactly one bucket and
    * each left row probes only the (at most two) buckets its window can
    * overlap, via `explode(sequence(…))`. The join is then a pure
    * EQUI-join on (keys, bucket) — shuffled, AQE-skew-splittable, never a
    * BroadcastNestedLoop — and the exact range predicate filters within
    * the matched buckets. Work per left row is bounded by the rows in two
    * buckets, not the key's whole history; a right row is never counted
    * twice because its single bucket is probed at most once per left row.
    * Counts come back onto ALL left ids through a left join against the
    * (id, count) aggregate, zero-filled, so empty-window rows survive.
    *
    * Time columns are numeric (callers here use epoch micros); buckets
    * use floor division, so negative times are handled correctly.
    *
    * Measured (ScaleProbe skew adjudication, sf0.1 ×8, one user holding
    * ~50% of events): hot-key costs ~5.5× the uniform corpus on the
    * default 4-partition local plan, and AQE's skew-join split fires
    * (skewsplit=true) once thresholds are scaled to the tier — the
    * escape hatch is the planner's, not a custom operator. */
  def rangeJoinCount(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTime: String,
      rightTime: String,
      lower: Long,
      upper: Long,
      countName: String): DataFrame = {
    require(upper > lower, s"empty window: ($lower, $upper]")
    val width = upper - lower
    val probes = left
      .select(keys.map(col) ++ Seq(col(leftId).as("__id"), col(leftTime).as("__lt")): _*)
      .withColumn(
        "__bucket",
        explode(sequence(
          Windowing.floorDiv(col("__lt") + lit(lower), width),
          Windowing.floorDiv(col("__lt") + lit(upper), width))))
    val build = right
      .select(keys.map(col) :+ col(rightTime).as("__rt"): _*)
      .withColumn("__bucket", Windowing.floorDiv(col("__rt"), width))
    val counts = probes
      .join(build, keys :+ "__bucket")
      .filter(col("__rt") > col("__lt") + lit(lower) && col("__rt") <= col("__lt") + lit(upper))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as(countName))
    val ids = left.select(col(leftId))
    ids
      .join(counts, ids(leftId) === counts("__id"), "left")
      .na.fill(0, Seq(countName))
      .select(col(leftId), col(countName))
  }

  /** orders ⋈ customer ⋈ nation, revenue per nation. */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        Relational.exactSumDouble(col("o_totalprice")).as("revenue"))
      .orderBy(col("n_name"))
}
