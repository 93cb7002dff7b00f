package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One per-window drift verdict (top-level for encoders): the exact
  * two-sample KS statistic between the window's value distribution and
  * the broadcast reference, plus both sample sizes. */
case class DriftWindow(window_start_ns: Long, n_window: Long, n_ref: Long, ks_stat: Double)

/** Per-open-window state (top-level for encoders): the window's value
  * histogram as parallel arrays — state ∝ DISTINCT values, never rows
  * (the batch [[graft.ops.Relational.ksDrift]] cardinality posture;
  * quantize continuous metrics to a grid first, same documented rule). */
case class DriftState(vals: Seq[Double], counts: Seq[Long])

/** Streaming distribution-drift monitor — the continuous flavor of
  * [[graft.ops.Relational.ksDrift]]: each tumbling event-time window's
  * value distribution is tested against a FIXED reference distribution
  * (the trusted corpus / last good generation / training slice), and one
  * exact KS row is emitted per window WHEN THE WATERMARK CLOSES IT —
  * the production gate that pages before a drifting upstream poisons a
  * mixture, running on the live stream instead of between generations.
  *
  * Exactness: the per-window statistic replicates the batch operator's
  * arithmetic step for step — (value, count) merge, ascending-value
  * running sums, `max |cumA/nA − cumB/nB|` with each term one IEEE
  * division of exact longs — so a replayed stream's verdicts EQUAL
  * batch `ksDrift` run on each window's slice (DriftStreamSpec pins
  * it). The reference ships as a driver map (bounded cardinality — the
  * same contract as the batch ECDF merge: exchanges/state scale with
  * the metric's cardinality, and truly-continuous metrics must be
  * quantized to a grid first).
  *
  * Scale shape: state per OPEN window = its distinct-value histogram
  * (closed windows leave state immediately); arriving rows fold into
  * the histogram map-side of nothing — the only exchange is the
  * (bucket)-keyed state partitioning. Late events inside the delay
  * amend their window before it closes; the watermark adjudicates the
  * close (event-time timers fire windows with no further arrivals —
  * the [[GapAlertStream]] posture). */
object DriftStream {

  /** `stream` must carry (`tsCol` TimestampType, `valueCol` numeric);
    * `windowNs` is the tumbling width (whole micros); `reference` is the
    * fixed (value → count) distribution to test every window against. */
  def ksAgainstReference(
      stream: DataFrame,
      tsCol: String,
      valueCol: String,
      windowNs: Long,
      reference: Map[Double, Long],
      watermarkDelay: String): Dataset[DriftWindow] = {
    require(windowNs > 0, s"windowNs must be positive: $windowNs")
    require(windowNs % 1000L == 0, s"windowNs must be whole micros: $windowNs")
    require(reference.nonEmpty, "empty reference distribution")
    require(reference.valuesIterator.forall(_ > 0), "reference counts must be positive")
    import stream.sparkSession.implicits._
    // -0.0 and 0.0 are DISTINCT keys to a Scala/Java Double map but ONE
    // group to Spark SQL's groupBy (NormalizeFloatingNumbers) — collapse
    // them on both the reference and every arriving value, or a window
    // holding both would split one histogram cell the batch operator
    // merges and the stream==batch contract would break on signed zero
    def norm(v: Double): Double = if (v == 0.0) 0.0 else v
    // the reference's cumulative shape is computed ONCE driver-side:
    // ascending values with running counts, shipped in the closure
    val refSorted: Array[(Double, Long)] = reference
      .groupMapReduce { case (v, _) => norm(v) } { case (_, c) => c }(_ + _)
      .toArray.sortBy(_._1)
    val nRef: Long = refSorted.map(_._2).sum
    val keyed = stream
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull
        && !isnan(col(valueCol).cast("double")))
      .select(
        col(tsCol).as("__ts"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("__ts", watermarkDelay)
      .as[(java.sql.Timestamp, Double)]
    def nanos(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      (i.getEpochSecond * 1000000L + i.getNano / 1000L) * 1000L
    }
    keyed
      .groupByKey { case (ts, _) => Math.floorDiv(nanos(ts), windowNs) }
      .flatMapGroupsWithState[DriftState, DriftWindow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long,
         rows: Iterator[(java.sql.Timestamp, Double)],
         state: GroupState[DriftState]) =>
          val hist = scala.collection.mutable.Map[Double, Long]()
          state.getOption.foreach { st =>
            st.vals.indices.foreach(i => hist(st.vals(i)) = st.counts(i))
          }
          rows.foreach { case (_, v) =>
            val nv = if (v == 0.0) 0.0 else v // signed-zero collapse
            hist(nv) = hist.getOrElse(nv, 0L) + 1L
          }
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val windowEndNs = (bucket + 1) * windowNs
          if (wmNs >= windowEndNs && hist.nonEmpty) {
            // window closed: exact KS against the reference — the batch
            // operator's arithmetic on the merged distinct-value axis
            val nWin = hist.valuesIterator.sum
            val axis = (hist.keySet ++ refSorted.iterator.map(_._1)).toArray.sorted
            var cumW = 0L
            var cumR = 0L
            var ri = 0
            var ks = 0.0
            axis.foreach { v =>
              cumW += hist.getOrElse(v, 0L)
              while (ri < refSorted.length && refSorted(ri)._1 <= v) {
                cumR += refSorted(ri)._2; ri += 1
              }
              val d = math.abs(cumW.toDouble / nWin - cumR.toDouble / nRef)
              if (d > ks) ks = d
            }
            state.remove()
            Iterator.single(DriftWindow(bucket * windowNs, nWin, nRef, ks))
          } else if (hist.nonEmpty) {
            val vs = hist.keys.toSeq.sorted
            state.update(DriftState(vs, vs.map(hist)))
            // fire when the watermark passes the window end, even with
            // no further arrivals
            state.setTimeoutTimestamp(windowEndNs / 1000000L + 1)
            Iterator.empty
          } else {
            state.remove()
            Iterator.empty
          }
      }
  }
}
