package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming interval (time-bounded stream-stream) join — the continuous
  * flavor of [[graft.ops.Joins.rangeJoinCount]]'s underlying pairing: emit
  * (left, right) pairs of the same key with the right row's event time in
  * `(leftTime + lower, leftTime + upper]`, as both streams arrive.
  *
  * This is Spark's native stream-stream join shape and the reason it can
  * run unbounded: the WATERMARK plus the TIME-RANGE predicate bound the
  * state on both sides. Each side buffers only rows whose event time is
  * still joinable against the other side's watermark — once the watermark
  * passes `t + upper + delay`, a buffered row can never match again and
  * the state store drops it. Without the time bound the same join would
  * buffer both streams forever (ksqlDB's stream-stream join makes the
  * identical demand: `WITHIN` is mandatory).
  *
  * Both sides are keyed (equi-predicate), so the state is partitioned by
  * key exactly like the batch bucketed range join's shuffle — per-key
  * volume within the window is the only skew axis.
  */
object IntervalJoinStream {

  /** @param keys         equi-join key columns, same names on both sides
    *                     (emitted once, from the left)
    * @param leftTs       left event-time TIMESTAMP column
    * @param rightTs      right event-time TIMESTAMP column (must be named
    *                     differently from `leftTs`; non-key payload
    *                     column names must be disjoint across sides)
    * @param lowerSeconds window lower bound, EXCLUSIVE, relative seconds
    * @param upperSeconds window upper bound, INCLUSIVE, relative seconds
    * @param delay        watermark delay for both sides ("10 minutes")
    * @param joinType     "inner" (default) or "leftOuter" (unmatched left
    *                     rows emit NULL right columns once the watermark
    *                     proves no match can arrive)
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lowerSeconds: Long,
      upperSeconds: Long,
      delay: String,
      joinType: String = "inner"): DataFrame = {
    require(upperSeconds > lowerSeconds, s"empty window: ($lowerSeconds, $upperSeconds]")
    require(leftTs != rightTs, "rename one side's event-time column — both survive in the output")
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    require(
      leftPayload.intersect(rightPayload).isEmpty,
      s"non-key columns must be disjoint: ${leftPayload.intersect(rightPayload).mkString(",")}")
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond =
      col(s"r.$rightTs") > col(s"l.$leftTs") + expr(s"INTERVAL $lowerSeconds SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperSeconds SECONDS")
    l.join(r, keyCond && timeCond, joinType)
      .select(keys.map(k => col(s"l.$k")) ++
        leftPayload.map(c => col(s"l.$c")) ++
        rightPayload.map(c => col(s"r.$c")): _*)
  }
}
