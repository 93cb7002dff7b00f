package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset-reset-capable change source (SURVEY.md §2.1 A1/B6 —
  * `SET 'auto.offset.reset'` / `startingOffsets`;
  * reference: ksql-transformations/01-movies-transform.sql:15,
  * apply-ksql-transformations.sh:62-67).
  *
  * A Kafka implementation would pass `startingOffsets` straight to the
  * connector; this environment has no Kafka jar, so the shipped
  * implementation replays a parquet changelog and applies the same offset
  * semantics to its `offset` column — identical downstream behavior,
  * which is all the §2.2 contract observes.
  */
trait ChangeSource {

  /** @param startingOffset None = the source's own configured default
    *                       (each implementation documents its resting
    *                       position — "earliest" here, the Config's
    *                       `startingOffsets` for [[KafkaChangeSource]] —
    *                       so a per-call override can never silently
    *                       shadow source configuration). Some(...):
    *                       "earliest" (replay all), "latest" (only new
    *                       data — empty for a static snapshot), or a
    *                       source-specific position: a numeric offset
    *                       (inclusive) where the source has one global
    *                       offset order ([[ParquetChangeSource]]); Kafka
    *                       offsets are per-partition, so
    *                       [[KafkaChangeSource]] takes the Kafka source's
    *                       per-partition JSON instead and rejects bare
    *                       numerics at construction. */
  def read(spark: SparkSession, startingOffset: Option[String] = None): DataFrame
}

/** Parquet-backed changelog topic stand-in. Default position: earliest. */
class ParquetChangeSource(path: String, offsetCol: String = "offset") extends ChangeSource {
  def read(spark: SparkSession, startingOffset: Option[String] = None): DataFrame = {
    val df = graft.GraftSession.configure(spark).read.parquet(path)
    startingOffset.getOrElse("earliest") match {
      case "earliest" => df
      case "latest"   => df.limit(0) // static snapshot has no future rows
      case n          => df.filter(col(offsetCol) >= n.toLong)
    }
  }
}
