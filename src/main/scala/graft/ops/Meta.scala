package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import org.apache.spark.sql.functions._

/** Metadata operations (SURVEY.md §2.1 D8) — the engine's `SHOW TABLES` /
  * `SHOW STREAMS` / `SHOW QUERIES` surface
  * (reference: tests/check-streams-ksql.sh:2, tests/check-queries-ksql.sh:2,
  * README.md:304-307).
  */
object Meta {

  /** View-name prefix for the engine's registered tables, so catalog
    * listings are stable regardless of other session state. */
  val Prefix = "graft_"

  private val fixtureTables: Seq[String] =
    Tables.relational ++ Seq("events", "documents", "embeddings")

  // last dir registered per session (weak keys: a dropped session must
  // not be pinned by this cache) — repeated SHOW TABLES calls skip the
  // O(tables) parquet-footer schema inference re-registration would redo
  private val registeredDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Register every fixture table as a `graft_`-prefixed temp view.
    * Idempotent AND cached: a repeat call for the (session, dir) already
    * registered is a no-op, so the catalog listing stays a driver-side
    * O(tables) operation however often it runs. Switching `dir` (or
    * passing `force = true`, e.g. after dropping a view manually)
    * re-registers — re-registration replaces. */
  def registerTables(spark: SparkSession, dir: String, force: Boolean = false): Unit =
    registeredDir.synchronized {
      if (force || registeredDir.get(spark) != dir) {
        fixtureTables.foreach { t =>
          Tables(spark, dir, t).createOrReplaceTempView(s"$Prefix$t")
        }
        registeredDir.put(spark, dir)
      }
    }

  /** `SHOW TABLES` over the engine's namespace: one sorted row per
    * registered table. */
  def listTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog
      .listTables()
      .select(col("name"))
      .filter(col("name").startsWith(Prefix))
      .withColumn("table_name", expr(s"substring(name, ${Prefix.length + 1})"))
      .select("table_name")
      .orderBy("table_name")
  }

  /** `SHOW QUERIES` analog: the active continuous queries of the session
    * (id, name, running). */
  def activeStreams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active
      .map(q => (q.id.toString, Option(q.name).getOrElse(""), q.isActive))
      .toSeq
      .toDF("id", "name", "is_active")
      .orderBy("id")
  }
}
