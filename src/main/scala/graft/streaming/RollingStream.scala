package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One trailing-window row (top-level for encoders) — the same shape the
  * batch [[graft.ops.Windowing.rollingStats]] emits: the event itself
  * plus count / exact sum / average of the key's FINITE values over the
  * preceding window (inclusive of now and all same-instant peers). */
case class RollingRow(
    key: Long, ts_ns: Long, seq: Long, value: Option[Double],
    n_win: Long, sum_win: Option[Double], avg_win: Option[Double])

/** Per-key trailing-window state (top-level for encoders): the watermark
  * up to which rows have been emitted, plus the retained events as
  * parallel arrays — every event with `ts ≥ emittedWmNs − windowNs`
  * (older ones can no longer appear in any future row's frame). */
case class RollingState(
    emittedWmNs: Long, evTs: Seq[Long], evSeq: Seq[Long], evV: Seq[Option[Double]])

/** Streaming flavor of [[graft.ops.Windowing.rollingStats]] — per-event
  * trailing count/sum/avg as the stream flows, watermark-adjudicated so
  * a full replay EQUALS the batch operator row-for-row.
  *
  * Why emission must wait for the watermark: the batch RANGE frame
  * includes all same-instant peers, and a peer (or any event inside the
  * delay) can still arrive after the row itself — emitting on arrival
  * would publish a frame that later grows. A row at event-time `t` is
  * emitted exactly once, when the watermark passes `t` (no in-delay
  * arrival can still land in `[t − window, t]`); rows later than the
  * delay are dropped by the watermark, the standard contract.
  *
  * Exactness: the sum replicates [[graft.ops.Relational.exactSum]]'s
  * arithmetic — each finite value rounds to DECIMAL(38,6) scale
  * (`BigDecimal.valueOf(v).setScale(6, HALF_UP)`, the same
  * double→decimal cast Spark executes), the decimals add exactly
  * (order-independent), and the average is one IEEE division of the
  * exact parts — so streamed rows are BIT-equal to batch rows
  * (RollingStreamSpec pins replay == batch including NaN/NULL events).
  *
  * Scale shape: state per key = the events inside
  * (watermark-delay + window) of event-time — the out-of-orderness
  * horizon plus the frame depth, NEVER the key's history (emitted
  * events evict as the watermark advances past their last possible
  * frame). Each row's frame is computed by one scan of that bounded
  * buffer (O(buffer) per emission; a fenwick-tree state would shave the
  * constant but the buffer is already delay+window-bounded). Event-time
  * timers drain pending rows on watermark advance alone —
  * [[GapFillStream]]'s posture. */
object RollingStream {

  /** `stream` must carry (`keyCol` long, `tsCol` TimestampType, `seqCol`
    * long, `valueCol` double); `windowNs` is the trailing frame width in
    * nanos (whole micros — the TimestampType axis). Emitted `ts_ns` is
    * the event's epoch-nanos (micros × 1000, the [[graft.Tables]]
    * convention for micros-resolution data). */
  def rolling(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      valueCol: String,
      windowNs: Long,
      watermarkDelay: String): Dataset[RollingRow] = {
    require(windowNs > 0, s"windowNs must be positive: $windowNs")
    require(windowNs % 1000L == 0, s"windowNs must be whole micros: $windowNs")
    import stream.sparkSession.implicits._
    val keyed = stream
      // seq guarded too: it decodes into a non-nullable primitive tuple
      // field (value already rides Option), so one NULL-seq row killed
      // the query into a restart crash loop (r20 review finding)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(seqCol).isNotNull)
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).as("__ts"),
        col(seqCol).cast("long").as("seq"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long, Option[Double])]
    def nanos(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      (i.getEpochSecond * 1000000L + i.getNano / 1000L) * 1000L
    }
    // the batch operator's accumulated-sum headroom bound (1e20 — the
    // zOutliers/groupMoments arithmetic), not just non-finiteness: a
    // value past it is excluded from the batch decimal sum, so the
    // stream's BigDecimal accumulation must exclude it too or replay
    // would diverge from batch on extreme inputs
    def isFinite(v: Double): Boolean =
      !v.isNaN && math.abs(v) < 1e20
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[RollingState, RollingRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Option[Double])],
         state: GroupState[RollingState]) =>
          val st = state.getOption.getOrElse(RollingState(Long.MinValue, Nil, Nil, Nil))
          val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])]()
          st.evTs.indices.foreach(i => buf += ((st.evTs(i), st.evSeq(i), st.evV(i))))
          rows.foreach { case (_, ts, seq, v) => buf += ((nanos(ts), seq, v)) }
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          // a row is frame-complete once the watermark passes it (no
          // in-delay arrival can land at ts' ≤ its ts anymore); events
          // below the PREVIOUS emission watermark are still retained as
          // frame members but were already emitted — never re-emit them
          val toEmit = buf
            .filter(e => e._1 < wmNs && e._1 >= st.emittedWmNs)
            .sortBy(e => (e._1, e._2))
          val out = toEmit.map { case (ts, seq, v) =>
            var n = 0L
            var sum = java.math.BigDecimal.ZERO
            buf.foreach { case (ets, _, ev) =>
              if (ets >= ts - windowNs && ets <= ts) ev.foreach { x =>
                if (isFinite(x)) {
                  n += 1
                  sum = sum.add(java.math.BigDecimal.valueOf(x)
                    .setScale(6, java.math.RoundingMode.HALF_UP))
                }
              }
            }
            RollingRow(key, ts, seq, v,
              n,
              if (n > 0) Some(sum.doubleValue()) else None,
              if (n > 0) Some(sum.doubleValue() / n) else None)
          }
          // retain: emitted events stay while they can still fall in a
          // FUTURE row's frame — future rows have ts ≥ wm, whose frames
          // reach back to wm − window
          val retained = buf.filter(_._1 >= wmNs - windowNs).sortBy(e => (e._1, e._2))
          state.update(RollingState(
            math.max(st.emittedWmNs, wmNs),
            retained.map(_._1).toSeq,
            retained.map(_._2).toSeq,
            retained.map(_._3).toSeq))
          // pending (unemitted, ts ≥ wm) rows drain on watermark advance
          // alone: arm a timer just past the earliest pending event-time
          val pending = buf.collect { case e if e._1 >= wmNs => e._1 }
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.min / 1000000L + 1)
          out.iterator
      }
  }
}
