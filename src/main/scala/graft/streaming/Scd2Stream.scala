package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous SCD Type-2 history — the streaming flavor of
  * [[graft.ops.Changelog.scd2]]: as each key's next event arrives, the
  * previously open version CLOSES and is emitted as an immutable
  * `(row, valid_from_seq, valid_to_seq)` fact (append semantics — a
  * closed interval never changes, so the sink is a plain append table;
  * the OPEN versions live in state, exactly the rows
  * `Changelog.applyChangelog` materializes).
  *
  * Ordering contract: per-key arrival follows sequence order — the
  * delivery guarantee the reference's CDC topics actually provide
  * (Debezium keys change events by PK, and Kafka preserves order within
  * a partition; reference: start-source-connector.sh topic routing). An
  * event arriving BELOW the key's sequence frontier cannot splice an
  * interval into already-emitted history (the closed fact is immutable),
  * so it is dropped — same posture as [[ChangelogStream.latestByKey]]'s
  * stale-event rejection, and the batch [[graft.ops.Changelog.scd2]]
  * replay is the documented recovery for a corrupted feed. Within a
  * micro-batch, events sort by sequence before folding, so any chunking
  * of an ordered feed emits identical history (Scd2StreamSpec).
  *
  * Scale: state is ONE (seq, open-version) record per key — the
  * reference's ~1-2 KB/key RocksDB sizing note applies unchanged;
  * emission is ∝ closed versions, work ∝ batch rows.
  */
object Scd2Stream {

  /** Closed version facts for a keyed changelog stream. The stored state
    * row is always the key's last ACCEPTED event (tombstones included —
    * kept with `open = false` so the sequence frontier survives a
    * delete; no nullable state fields exist).
    *
    * `isDelete` contract: the batch [[graft.ops.Changelog.scd2]] treats
    * a NULL predicate result as DELETED (`!coalesce(pred, true)` — the
    * raw-tombstone posture shared by applyChangelog / PullQuery /
    * ReplicationPipeline). A typed `T => Boolean` cannot return NULL,
    * so the caller MUST fold that posture into the function: any field
    * a raw tombstone nulls out maps to `true`, e.g.
    * `e => e.eventType == null || e.eventType == "delete"` — otherwise
    * a null-typed tombstone would OPEN a version here that the batch
    * replay closes, breaking the documented stream==batch history
    * equality (Scd2StreamSpec pins the null-tombstone case). */
  def closedVersions[K: Encoder, T: Encoder](
      ds: Dataset[T],
      key: T => K,
      seq: T => Long,
      isDelete: T => Boolean): Dataset[(T, Long, Long)] = {
    implicit val stateEnc: Encoder[(Long, Boolean, T)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaBoolean, implicitly[Encoder[T]])
    implicit val outEnc: Encoder[(T, Long, Long)] =
      Encoders.tuple(implicitly[Encoder[T]], Encoders.scalaLong, Encoders.scalaLong)
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Long, Boolean, T), (T, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[(Long, Boolean, T)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(T, Long, Long)]
          var st = state.getOption
          rows.toSeq.sortBy(seq).foreach { ev =>
            val s = seq(ev)
            st match {
              case Some((frontier, _, _)) if s <= frontier =>
                () // below the frontier: immutable history cannot be spliced
              case Some((_, open, openRow)) =>
                if (open) out += ((openRow, seq(openRow), s))
                st = Some((s, !isDelete(ev), ev))
              case None =>
                st = Some((s, !isDelete(ev), ev))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
