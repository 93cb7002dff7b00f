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
