package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous first-order transition counts — the live flavor of
  * [[graft.ops.EventAnalytics.transitions]]: each arriving event closes
  * a (prev_type → next_type) pair against its key's last accepted
  * event, and the pair stream feeds a running count aggregate — the
  * behavioral monitor that notices "error → error is climbing" while
  * it climbs, not in tomorrow's batch.
  *
  * Ordering contract and frontier semantics are [[Scd2Stream]]'s: the
  * per-key feed follows sequence order (the Kafka keyed-topic
  * guarantee, measured by q_disorder); an event below the key's
  * frontier is dropped — its pair membership is unrecoverable without
  * replaying history — and the batch operator is the replay recovery.
  *
  * Scale: state is ONE (frontier, last-type) record per key; the pair
  * stream carries |types|²-bounded keys into a standard streaming
  * aggregation whose state is ∝ distinct pairs (tiny). Probabilities
  * are a read-time projection over the counts table — a continuously
  * correct denominator needs the per-prev total, which the count table
  * itself provides (re-aggregate ∝ |types|², the batch operator's
  * shape). */
object TransitionsStream {

  /** The (prev_type, next_type) pair stream (append — a closed pair is
    * an immutable fact). */
  def pairs[K: Encoder, T: Encoder](
      ds: Dataset[T],
      key: T => K,
      seq: T => Long,
      typ: T => String): Dataset[(String, String)] = {
    implicit val stateEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Long, String), (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[(Long, String)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var st = state.getOption
          // a NULL-typed event does not participate AT ALL — the batch
          // operator filters it before the lag window, so it must
          // neither emit a pair nor advance the frontier here (or a
          // later A..B run would lose its A→B pair vs the replay)
          rows.toSeq.filter(typ(_) != null).sortBy(seq).foreach { ev =>
            val s = seq(ev)
            val t = typ(ev)
            st match {
              case Some((frontier, _)) if s <= frontier => () // below the frontier
              case Some((_, prev)) =>
                out += ((prev, t))
                st = Some((s, t))
              case None =>
                st = Some((s, t))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Running (prev_type, next_type, n_pairs) counts over the pair
    * stream — update-mode emissions, state ∝ distinct pairs. */
  def transitionCounts[K: Encoder, T: Encoder](
      ds: Dataset[T],
      key: T => K,
      seq: T => Long,
      typ: T => String): DataFrame =
    pairs(ds, key, seq, typ)
      .toDF("prev_type", "next_type")
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
}
