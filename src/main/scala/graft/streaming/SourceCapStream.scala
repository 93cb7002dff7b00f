package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change to a stratum's survivor set (top-level for encoders):
  * `action` is `"add"` (id entered the winner set) or `"evict"` (a
  * previously-added id was displaced by a better-ranked arrival). The
  * CUMULATIVE FOLD of the change log — adds minus evicts — is the
  * operator's result; a keyed sink (the JdbcMerge upsert/delete pair)
  * applies it directly. */
case class CapChange(stratum: String, id: Long, action: String)

/** Input row after digest projection (top-level for encoders). */
case class CapRowIn(stratum: String, id: Long, ck: String)

/** Per-stratum state: the current winner set as parallel sorted arrays
  * (top-level for encoders). */
case class CapWinners(cks: Seq[String], ids: Seq[Long])

/** Streaming flavor of [[graft.ops.TextOps.sourceCap]] — the
  * anti-domination quota enforced AS THE CORPUS ARRIVES instead of in a
  * batch re-scan.
  *
  * Same selection rule as batch: a stratum keeps the `cap` rows with the
  * smallest `(md5(salt:stratum:id), id)` rank — a deterministic
  * pseudo-random draw, so which rows win depends only on the data, never
  * on arrival order. That order-independence is what makes streaming
  * parity EXACT, not best-effort: after any prefix of the stream, the
  * state holds the true top-`cap` of the rows seen so far, and once all
  * rows are seen the folded change log equals the batch survivor set
  * (SourceCapStreamSpec pins it).
  *
  * The cost of parity is RETRACTION: a winner after batch 1 may be
  * displaced in batch 5 by a smaller digest, so the output is a keyed
  * change log (add/evict) in update mode, not an append stream —
  * exactly the tombstone-bearing changelog shape the CDC pipeline
  * already sinks (evict = delete, add = upsert).
  *
  * State bound: this is NOT stateless — each live stratum holds its
  * current `cap` winners, so state is ∝ strata × cap × ~(32-char hex +
  * id) ≈ 48 B per retained winner, independent of corpus size. A
  * crawl-scale mixture (thousands of sources, cap in the hundreds)
  * holds a few hundred MB across ALL executors; state never grows with
  * rows seen, only with the (strata × cap) product. Rows that lose at
  * arrival time are dropped immediately and never re-enter state. */
object SourceCapStream {

  def capped(
      stream: DataFrame,
      idCol: String,
      strataCol: String,
      cap: Int,
      salt: String = "cap"): Dataset[CapChange] = {
    require(cap >= 1, s"cap must be positive: $cap")
    val spark = stream.sparkSession
    import spark.implicits._
    // the EXACT batch digest: rank is a pure function of (salt, stratum, id)
    val prepared = stream
      .filter(col(strataCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(strataCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"),
        md5(concat(
          lit(salt), lit(":"), col(strataCol).cast("string"),
          lit(":"), col(idCol).cast("string"))).as("ck"))
      .as[CapRowIn]
    prepared
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[CapRowIn], state: GroupState[CapWinners]) =>
          val prev: Vector[(String, Long)] = state.getOption
            .map(w => w.cks.zip(w.ids).toVector).getOrElse(Vector.empty)
          val ord = Ordering[(String, Long)]
          // fold the batch's arrivals into the running top-cap min-set;
          // hex md5 compares stringwise == unsigned-byte order, the same
          // rank the batch window sorts by
          var cur = prev
          rows.foreach { r =>
            val cand = (r.ck, r.id)
            if (!cur.contains(cand)) {
              if (cur.length < cap) cur = (cur :+ cand).sorted
              else if (ord.lt(cand, cur.last)) cur = (cur.init :+ cand).sorted
            }
          }
          state.update(CapWinners(cur.map(_._1), cur.map(_._2)))
          val prevIds = prev.map(_._2).toSet
          val curIds = cur.map(_._2).toSet
          val adds = (curIds -- prevIds).toSeq.sorted.map(CapChange(stratum, _, "add"))
          val evicts = (prevIds -- curIds).toSeq.sorted.map(CapChange(stratum, _, "evict"))
          (adds ++ evicts).iterator
      }
  }
}
