package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's higher-order functions (`zip_with` / `aggregate`) — no UDF
  * serialization, NULL-safe. Note HOFs evaluate interpreted (they have no
  * doGenCode), so per-row cost is ~dim interpreted ops; fine for re-rank
  * stages over candidate sets, and the reason candidate GENERATION in
  * Similarity/NearDup joins on small hashed keys first.
  *
  * Accumulation is in Double even for Float inputs: at dim=64..4096 the
  * float rounding error of a running sum is visible in top-k ordering —
  * the SAME order as [[VectorKernels.cosine]], so this module doubles as
  * the independent (interpreted) cross-check for the native kernels
  * (VectorOpsSpec asserts bit-equality).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); NULL if either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(null)).otherwise(dot(a, b) / denom)
  }

  /** ‖a-b‖₂ — L2 distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))

  /** Pre-normalized copy of a vector (cosine → dot product at query time;
    * normalize once at ingest, not once per candidate pair). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }
}
