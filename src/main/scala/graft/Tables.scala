package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every loader goes through `spark.read.parquet` so Catalyst gets a
  * relation it can push filters / prune columns into — callers should
  * select/filter on the returned DataFrame and let pushdown do its job,
  * never pre-materialize.
  */
object Tables {

  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** The CDC-changelog stand-in. `ts` is parquet TIMESTAMP(NANOS); we read
    * it as an epoch-nanos Long (`ts_ns`) — lossless, totally ordered, and
    * identical in Spark and the DuckDB oracle (`epoch_ns(ts)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").withColumnRenamed("ts", "ts_ns")

  /** Epoch-micros view of `ts_ns` for engine-portable output (DuckDB
    * truncates parquet TIMESTAMP_NANOS to micros on read, so micros is the
    * finest precision every engine agrees on; ordering still uses the
    * full-precision `ts_ns`/`event_id`). */
  def withTsMicros(df: DataFrame): DataFrame =
    df.withColumn("ts_us", graft.ops.Windowing.floorDiv(col("ts_ns"), 1000L))

  /** `ts_ns` as a proper TimestampType column (micros, floor-truncated)
    * for window / date functions. */
  def tsColumn(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
