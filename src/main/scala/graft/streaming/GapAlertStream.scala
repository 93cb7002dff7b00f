package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A key went silent: no event for `gap` after `lastSeenUs`
  * (event-time, watermark-adjudicated). */
case class GapAlert(key: Long, last_seen_us: Long, gap_us: Long)

/** Dead-man's switch — the STREAMING half of silence detection
  * ([[graft.ops.EventAnalytics.gaps]] is the batch half over history):
  * alert once when a key stops heartbeating for `gapUs`, re-arming if
  * the key ever comes back. A stalled CDC connector, a dead device, a
  * silent partition — the alert the reference stack would hang off
  * Connect's status topic, here as first-class event-time state.
  *
  * Semantics (deterministic under event time, NOT wall clock): an alert
  * for key K fires when the stream's WATERMARK passes K's
  * `last_seen + gap` — late data within the watermark delay can still
  * push `last_seen` forward and cancel the pending alert, which is
  * exactly the false-positive protection wall-clock timers lack. On
  * firing, state clears: one alert per silence episode; a key heard
  * again later starts a fresh episode (and its batch-side gap row is
  * what [[graft.ops.EventAnalytics.gaps]] reports for the interior
  * silence).
  *
  * Scale shape: state is ONE Long per live key (RocksDB-backed via
  * [[ChangelogStream.configure]]), hash-partitioned; each batch folds
  * only arriving keys plus expiring timers — cost ∝ arrivals + alerts,
  * never ∝ tracked keys. */
object GapAlertStream {

  /** `stream` must carry (`keyCol` long, `tsCol` TimestampType);
    * `watermarkDelay` bounds how late a heartbeat may arrive and still
    * cancel its pending alert. */
  def alerts(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      gapUs: Long,
      watermarkDelay: String): Dataset[GapAlert] = {
    require(gapUs > 0, s"gapUs must be positive: $gapUs")
    import stream.sparkSession.implicits._
    // the watermark must ride the TIMESTAMP column all the way into the
    // keyed Dataset (a derived Long drops the event-time metadata and
    // EventTimeTimeout refuses the plan) — micros conversion happens
    // inside the fold instead
    val keyed = stream
      // a NULL key or NULL timestamp is not a heartbeat: unguarded, a
      // null key dies in the primitive-Long tuple encoder and a null ts
      // (which the watermark late-filter KEEPS — its predicate is NULL)
      // NPEs in the micros conversion, killing the query into a
      // checkpoint-restart crash loop on the same poison row (r20
      // review finding; DriftStream/GapFillStream already guard)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("__hb_ts"))
      .withWatermark("__hb_ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, GapAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed last_seen + gap with no newer heartbeat:
            // the silence is real (no in-delay data can refute it now)
            val lastSeen = state.get
            state.remove()
            Iterator.single(GapAlert(key, lastSeen, gapUs))
          } else {
            val newest = rows.map(r => micros(r._2)).max
            val lastSeen = state.getOption.fold(newest)(math.max(_, newest))
            state.update(lastSeen)
            // arm (or push back) the dead-man timer in EVENT time
            state.setTimeoutTimestamp((lastSeen + gapUs) / 1000L)
            Iterator.empty
          }
      }
  }
}
