package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live key-skew monitor — the streaming half of the batch
  * `q_heavy_hitters_approx` pairing: ONE Misra–Gries sketch
  * ([[graft.functions.MisraGries]]) runs as the global streaming
  * aggregate of a keyed stream, so the skew measurement every
  * salting / bucket-count decision consults is available WHILE the
  * stream runs instead of after the fact.
  *
  * State ∝ capacity, never keys: the sketch buffer holds ≤ `capacity`
  * counters however many distinct keys flow past (billions of users →
  * one bounded state row), serialized into the state store between
  * micro-batches via the aggregate's own length-prefixed codec. Each
  * trigger's partials merge with the persisted buffer by the
  * sum-then-trim recipe, which PRESERVES the MG bounds across any
  * batch/partition arrival order (Agarwal et al., PODS 2012) — so the
  * replayed stream's final sketch passes the exact-side audit
  * ([[graft.ops.Relational.heavyHittersChecked]]'s booleans) even
  * though its raw estimates differ from a batch run's merge order
  * (HeavyHittersStreamSpec pins both).
  *
  * Output (complete mode — a global aggregate has one live row):
  * `sketch array<struct<key,est>>, n_rows` per trigger. The raw
  * estimates are merge-order-dependent and carry the
  * ⌊n/(capacity+1)⌋ undercount — they are a MONITOR (which keys are
  * hot, roughly how hot), not a declared result; the exact/checked
  * batch pairing stays the oracle surface. */
object HeavyHittersStream {

  /** `stream` is any streaming DataFrame with `keyCol`; NULL keys are
    * outside the sketch's domain (the checked-harness contract). Run
    * with `outputMode("complete")`. */
  def sketchStream(stream: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity=$capacity must be >= 1")
    stream
      .filter(col(keyCol).isNotNull)
      .agg(
        graft.functions.MisraGries.mgSketch(col(keyCol), capacity).as("sketch"),
        count(lit(1)).as("n_rows"))
  }
}
