package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous flavor of
  * [[graft.ops.TextOps.exactDedup]] for ingest-time pipelines (a training
  * corpus deduped as it arrives, rather than re-scanned in batch).
  *
  * Both flavors key on the 16-byte content fingerprint (md5 of the raw
  * text bytes — the same key the batch operator groups by), so streaming
  * state and shuffle carry 16 bytes per distinct document, never the
  * document body.
  *
  * Two state regimes, mirroring Spark's two dedup operators:
  *  - [[dedup]]: `dropDuplicates` — state grows with distinct documents
  *    forever (the ksqlDB-TABLE-like unbounded regime; state ∝ corpus
  *    distinct count, the honest cost of exact global dedup);
  *  - [[dedupWithinWatermark]]: `dropDuplicatesWithinWatermark` — state
  *    is bounded by the watermark horizon; duplicates farther apart than
  *    the delay are NOT collapsed. This is the 100 TB-stream shape:
  *    near-in-time duplicates (crawler re-fetches, retry storms) are
  *    removed with bounded state, and a periodic batch `exactDedup` pass
  *    handles long-range duplicates.
  */
object DedupStream {

  /** First-arrival row per distinct text, unbounded state. */
  def dedup(df: DataFrame, textCol: String): DataFrame =
    dedupBy(df, md5(col(textCol).cast("binary")))

  /** [[dedup]] with an explicit key expression — for pipelines whose
    * dedup identity is not the raw bytes (the ingest facade keys on the
    * whitespace-NORMALIZED fingerprint so its within-stream stage
    * agrees with its against-history stage and with the batch replay;
    * r20 review finding: the raw-md5 default silently let 'a b' and
    * 'a  b' both through a pipeline whose batch flavor keeps one). */
  def dedupBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__fp", key)
      .dropDuplicates("__fp")
      .drop("__fp")

  /** First-arrival row per distinct text within the watermark horizon;
    * `tsCol` must be a timestamp column and `delay` a duration string
    * (e.g. "10 minutes"). State for a fingerprint is dropped once the
    * watermark passes its event time + delay. */
  def dedupWithinWatermark(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      delay: String): DataFrame =
    df.withColumn("__fp", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming flavor of [[graft.ops.TextOps.dedupAgainst]]: drop
    * arriving docs whose normalized text already exists in a STATIC
    * historical corpus — a stream-static anti-join, the ingest-time
    * "is this already in the training set" gate. The history is reduced
    * once to distinct 16-byte fingerprints (Spark re-plans the static
    * side per micro-batch but the stream side carries only a
    * fingerprint column; persist the fingerprint set if the history
    * scan dominates a micro-batch). Stateless on the stream side —
    * no watermark needed, unlike [[dedup]]'s within-stream state.
    * Compose with [[dedup]] downstream to also collapse duplicates
    * WITHIN the stream. */
  def dedupAgainstHistory(
      stream: DataFrame,
      history: DataFrame,
      textCol: String): DataFrame = {
    val fp = md5(trim(regexp_replace(col(textCol), "\\s+", " ")))
    val seen = history.select(fp.as("__fp")).distinct()
    stream
      .withColumn("__fp", fp)
      .join(seen, Seq("__fp"), "left_anti")
      .drop("__fp")
  }
}
