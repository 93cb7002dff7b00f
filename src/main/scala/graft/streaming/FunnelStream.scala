package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user's funnel event (top-level for encoder derivation). */
case class FunnelEvent(user: Long, ts: Long, eventId: Long, eventType: String)

/** A user's new conversion depth, emitted when it advances. */
case class FunnelDepth(user: Long, depth: Int)

/** Continuous funnel tracking — the streaming flavor of
  * [[graft.ops.EventAnalytics.funnel]]: per-user conversion depth
  * maintained incrementally as events arrive, emitting a user's NEW
  * depth whenever it advances (`EMIT CHANGES`-style update mode).
  *
  * Order contract: funnel advancement is order-sensitive, so the stream
  * equals the batch operator exactly when each user's events arrive in
  * (ts, eventId) order — the per-key ordering a keyed Kafka topic
  * guarantees, i.e. the reference's own delivery model. Within a
  * micro-batch events are sorted by (ts, eventId) before folding, so
  * batch boundaries never reorder; across batches depth is monotone —
  * a late out-of-order event can fail to advance the funnel but can
  * never rewind it.
  *
  * Scale shape: state is one Int per user, hash-partitioned across
  * executors (RocksDB-backed via [[ChangelogStream.configure]]); per
  * batch each user folds only their own arrivals. */
object FunnelStream {

  def funnelDepths(ds: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelDepth] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[Int, FunnelDepth](OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[Int]) =>
          val prior = state.getOption.getOrElse(0)
          var depth = prior
          val ordered = rows.toArray.sortBy(e => (e.ts, e.eventId))
          var i = 0
          while (i < ordered.length) {
            if (depth < steps.size && ordered(i).eventType == steps(depth)) depth += 1
            i += 1
          }
          if (depth == prior) Iterator.empty
          else {
            state.update(depth)
            Iterator.single(FunnelDepth(user, depth))
          }
      }
  }
}
