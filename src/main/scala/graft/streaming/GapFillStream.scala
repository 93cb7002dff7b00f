package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One regularized grid slot (top-level for encoders): observed slots
  * carry their latest value with `filled=false`, silent slots repeat the
  * previous value with `filled=true` — the same row shape the batch
  * [[graft.ops.Windowing.gapFill]] emits. */
case class GapFillSlot(key: Long, slot_start_us: Long, value: Double, filled: Boolean)

/** Per-key LOCF state (top-level for encoders): the last emitted slot
  * with its carry observation, plus the pending not-yet-closed
  * observations as parallel arrays (slot → best (ts, seq, value)). */
case class GapFillState(
    hasLast: Boolean, lastSlot: Long, carryV: Double,
    pendSlot: Seq[Long], pendTs: Seq[Long], pendSeq: Seq[Long], pendV: Seq[Double])

/** Streaming gap fill with last-observation-carried-forward — the
  * continuous flavor of [[graft.ops.Windowing.gapFill]] (the natural
  * pairing with [[GapAlertStream]]: one watches silence, this one
  * REPAIRS it onto a regular grid as the stream flows).
  *
  * Semantics (event-time, watermark-adjudicated — deterministic): slot
  * `s` covers `[s·step, (s+1)·step)`; it is emitted exactly once, when
  * BOTH hold: the watermark has passed the slot's end (no in-delay late
  * event can still claim it), and the key has an observation at some
  * slot ≥ s (interior gaps fill; trailing silence emits nothing — the
  * batch spine also ends at the last observation, which is what makes
  * stream == batch EXACT rather than approximate). Each key's grid
  * starts at its first observed slot. Within a slot the value is the
  * latest observation by (ts, seq) — the batch tie-break. Late events
  * inside the watermark delay land in their slot (GapFillStreamSpec
  * pins it); events later than that are dropped by the watermark, the
  * standard contract.
  *
  * After full replay with the watermark pushed past the data, the
  * emitted rows EQUAL the batch gapFill output row-for-row
  * (GapFillStreamSpec). The emission trigger is two-sided:
  * closable-on-arrival slots emit in the arriving batch, and slots
  * whose close the watermark reaches later fire via an event-time timer
  * armed at the next unclosed slot end ([[GapAlertStream]]'s
  * EventTimeTimeout posture), so a key needs no further arrivals to
  * drain its interior gaps.
  *
  * Scale shape: state per key is one carry value plus the pending
  * observations not yet closed — bounded by watermark-delay/step slots
  * (the out-of-orderness horizon), NOT by the key's history; emitted
  * slots leave state immediately. RocksDB-backed via
  * [[ChangelogStream.configure]], hash-partitioned by key; per batch
  * the work is ∝ arrivals + closing slots, never ∝ tracked keys. */
object GapFillStream {

  /** `stream` must carry (`keyCol` long, `tsCol` TimestampType, `seqCol`
    * long, `valueCol` double); `stepUs` is the grid width in micros. */
  def filled(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      valueCol: String,
      stepUs: Long,
      watermarkDelay: String): Dataset[GapFillSlot] = {
    require(stepUs > 0, s"stepUs must be positive: $stepUs")
    import stream.sparkSession.implicits._
    // watermark rides the TimestampType column into the keyed Dataset
    // (a derived Long drops the event-time metadata — GapAlertStream's
    // lesson); micros conversion happens inside the fold
    val keyed = stream
      // seq/value guarded too: they decode into non-nullable primitive
      // tuple fields, so one NULL row killed the query into a
      // checkpoint-restart crash loop (r20 review finding)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(seqCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).as("__ts"),
        col(seqCol).cast("long").as("seq"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long, Double)]
    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapFillState, GapFillSlot](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[GapFillState]) =>
          val st = state.getOption.getOrElse(
            GapFillState(hasLast = false, 0L, 0.0, Nil, Nil, Nil, Nil))
          // pending: slot -> best (ts, seq, v) so far
          val pending = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
          st.pendSlot.indices.foreach { i =>
            pending(st.pendSlot(i)) = (st.pendTs(i), st.pendSeq(i), st.pendV(i))
          }
          rows.foreach { case (_, ts, seq, v) =>
            val us = micros(ts)
            val slot = Math.floorDiv(us, stepUs)
            // a slot already emitted is final — an arrival this late is
            // outside the contract's delay and is discarded like any
            // watermark-late row
            if (!(st.hasLast && slot <= st.lastSlot)) {
              val keepExisting = pending.get(slot).exists { case (pts, pseq, _) =>
                pts > us || (pts == us && pseq >= seq)
              }
              if (!keepExisting) pending(slot) = (us, seq, v)
            }
          }
          // slot s closes when watermark >= (s+1)*step; emission also
          // never passes the newest observation (interior gaps only)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val out = scala.collection.mutable.ArrayBuffer[GapFillSlot]()
          var hasLast = st.hasLast
          var lastSlot = st.lastSlot
          var carryV = st.carryV
          if (pending.nonEmpty) {
            val maxObserved = pending.keys.max
            val wmSlot = Math.floorDiv(wmUs, stepUs) - 1L
            val start = if (hasLast) lastSlot + 1 else pending.keys.min
            val emitUpTo = math.min(maxObserved, wmSlot)
            var s = start
            while (s <= emitUpTo) {
              pending.remove(s) match {
                case Some((_, _, v)) =>
                  out += GapFillSlot(key, s * stepUs, v, filled = false)
                  carryV = v
                case None =>
                  out += GapFillSlot(key, s * stepUs, carryV, filled = true)
              }
              hasLast = true
              lastSlot = s
              s += 1
            }
          }
          val slots = pending.keys.toSeq.sorted
          state.update(GapFillState(
            hasLast, lastSlot, carryV,
            slots,
            slots.map(k => pending(k)._1),
            slots.map(k => pending(k)._2),
            slots.map(k => pending(k)._3)))
          if (pending.nonEmpty) {
            // the next slot to close: arm an event-time timer at its end
            // so interior gaps drain on watermark advance alone
            val nextSlot = if (hasLast) lastSlot + 1 else pending.keys.min
            state.setTimeoutTimestamp(((nextSlot + 1) * stepUs) / 1000L + 1)
          }
          out.iterator
      }
  }
}
