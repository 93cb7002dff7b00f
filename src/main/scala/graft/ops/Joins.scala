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
    val saltedFact = fact.withColumn(
      "__graft_salt",
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(salts)).cast("int"))
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
