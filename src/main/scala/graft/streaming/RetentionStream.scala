package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user's activity event (top-level for encoder derivation). */
case class ActivityEvent(user: Long, ts: Long)

/** One newly-observed (cohort_day, day_offset) cell membership: `user`
  * was active `dayOffset` days after their cohort day, and this is the
  * first time the stream has seen that. Summing deltas per
  * (cohortDay, dayOffset) yields the retention matrix
  * [[graft.ops.EventAnalytics.retention]] computes in batch. */
case class RetentionDelta(user: Long, cohortDay: Long, dayOffset: Long)

/** Continuous cohort retention — the streaming flavor of
  * [[graft.ops.EventAnalytics.retention]]: each user's cohort day and
  * seen day-offsets are maintained incrementally, emitting one delta row
  * the first time a user is active on each new offset day (`EMIT
  * CHANGES`-style update mode — downstream, the retention matrix is a
  * running count per (cohortDay, dayOffset) over these deltas).
  *
  * Order contract (the [[FunnelStream]] convention): a user's cohort is
  * ANCHORED at their first-observed activity day and never re-anchors —
  * equal to the batch operator's min-day cohort exactly when each user's
  * events arrive in ts order (the per-key ordering a keyed Kafka topic
  * guarantees). Within a micro-batch events are sorted by ts before
  * folding, so batch boundaries never change the anchor; a late
  * out-of-order event from BEFORE the anchor computes a negative offset
  * and is dropped rather than rewriting history (the monotone-depth
  * analog — state only ever grows forward).
  *
  * Scale shape: state is one Long plus at most `maxOffsetDays + 1`
  * small ints per user (the offset cap bounds it by construction),
  * hash-partitioned across executors (RocksDB-backed via
  * [[ChangelogStream.configure]]); per batch each user folds only their
  * own arrivals, and emission is change-only — a day the user was
  * already seen active on emits nothing. */
object RetentionStream {

  val DayNanos: Long = 86400000000000L

  def retentionDeltas(
      ds: Dataset[ActivityEvent],
      maxOffsetDays: Int = 30,
      dayUnit: Long = DayNanos): Dataset[RetentionDelta] = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be non-negative: $maxOffsetDays")
    require(dayUnit > 0, s"dayUnit must be positive: $dayUnit")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[(Long, Seq[Int]), RetentionDelta](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[ActivityEvent], state: GroupState[(Long, Seq[Int])]) =>
          val days = rows.map(e => Math.floorDiv(e.ts, dayUnit)).toArray
          if (days.isEmpty) Iterator.empty
          else {
            java.util.Arrays.sort(days)
            val (anchor, seen0) = state.getOption.getOrElse((days(0), Seq.empty[Int]))
            val seen = scala.collection.mutable.TreeSet.empty[Int]
            seen ++= seen0
            val out = scala.collection.mutable.ArrayBuffer.empty[RetentionDelta]
            var i = 0
            while (i < days.length) {
              val off = days(i) - anchor
              if (off >= 0 && off <= maxOffsetDays && seen.add(off.toInt))
                out += RetentionDelta(user, anchor, off)
              i += 1
            }
            if (out.nonEmpty) state.update((anchor, seen.toSeq))
            out.iterator
          }
      }
  }
}
