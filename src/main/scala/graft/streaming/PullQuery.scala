package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pull queries against a RUNNING changelog query's materialized state —
  * the engine's analog of ksqlDB pull queries, which read the persistent
  * query's RocksDB TABLE state directly, not the topic (reference:
  * TOMBSTONE_HANDLING_GUIDE.md:185-195 `SELECT * FROM movies_transformed
  * WHERE id = 1` / `SELECT COUNT(*)`; README.md:144-150).
  *
  * Implementation: Spark's state data source (`format("statestore")`)
  * over the changelog query's checkpoint. This is the same state the
  * stream's [[ChangelogStream.latestByKey]] operator maintains (RocksDB
  * under the checkpoint), read as of the last COMMITTED micro-batch —
  * exactly ksqlDB's model of "query the current materialized table", with
  * its freshness bounded by the commit cadence (the 2 s default trigger).
  *
  * Scale notes: the read is DISTRIBUTED — one task per state-store
  * partition, state never collected to the driver — so pull queries scale
  * with the state exactly like the stream itself (unlike a driver-side
  * cache of the current table). Point lookups tolerate the full-partition
  * scan the same way ksqlDB pull queries do a RocksDB range read; the
  * key-partition pruning a dedicated serving layer would add is out of
  * scope, as it is for the reference (single ksqlDB instance).
  */
object PullQuery {

  /** The raw keyed state of the changelog query checkpointed at
    * `checkpointDir`: one row per key — the latest row seen, INCLUDING
    * retained tombstone rows ([[ChangelogStream.latestByKey]] keeps them
    * so late data cannot resurrect deleted keys). Works while the query
    * RUNS; reflects the last committed batch. */
  def stateSnapshot(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read
      .format("statestore")
      .option("path", checkpointDir)
      .load()
      .select(col("value.groupState.*"))

  /** The live TABLE view a ksqlDB pull query sees: state minus keys whose
    * latest row is a deletion (C2 semantics). `isDeleted` is the domain's
    * tombstone predicate, e.g. `col("event_type") === "delete"` or
    * `col("record").isNull`.
    *
    * A NULL predicate result counts as DELETED: a raw tombstone retained
    * in state is (key, NULL…) — every non-key field NULL — so any natural
    * field predicate (`col("__DELETED") === "true"`) evaluates NULL
    * exactly on tombstones, and treating NULL as live would resurrect
    * deleted keys. This mirrors [[ReplicationPipeline.isDeletion]]'s
    * NULL handling on the sink side. A predicate that must not have this
    * default can make itself total (`coalesce(pred, lit(false))`). */
  def liveState(spark: SparkSession, checkpointDir: String, isDeleted: Column): DataFrame =
    stateSnapshot(spark, checkpointDir).filter(!coalesce(isDeleted, lit(true)))

  /** D1: the point-lookup pull query (`... WHERE id = 1`). */
  def pointLookup(
      spark: SparkSession,
      checkpointDir: String,
      isDeleted: Column,
      keyCol: String,
      key: Any): DataFrame =
    liveState(spark, checkpointDir, isDeleted).filter(col(keyCol) === lit(key))

  /** D2: the COUNT(*) pull query over the live table. */
  def liveCount(spark: SparkSession, checkpointDir: String, isDeleted: Column): Long =
    liveState(spark, checkpointDir, isDeleted).count()
}
