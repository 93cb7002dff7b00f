package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.LatestRow

/** Direct contracts of the native latest-row aggregate: the plan shape it
  * exists for, the spill-path serialization (not exercised by small
  * queries), and NULL-ordering-value handling. */
class LatestRowSpec extends SparkTestBase {

  import spark.implicits._

  test("changelog aggregation plans as ObjectHashAggregate, with no Sort anywhere") {
    val df = Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 12L, "c")).toDF("k", "seq", "v")
    val plan = graft.ops.Changelog
      .latestByKey(df, Seq("k"), col("seq"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("rows with NULL sequence are ignored; all-NULL group yields NULL payload") {
    val df = Seq(
      (1L, Some(5L), "live"),
      (1L, None, "ignored-null-seq"),
      (2L, None, "only-null")
    ).toDF("k", "seq", "v")
    val got = df.groupBy(col("k"))
      .agg(LatestRow.latestRow(struct(col("v")), col("seq")).as("r"))
      .orderBy(col("k"))
      .collect()
    assert(got(0).getStruct(1).getString(0) == "live")
    assert(got(1).isNullAt(1))
  }

  test("unorderable ordering type is rejected at analysis time, not task runtime") {
    val df = Seq((1L, 10L, "a")).toDF("k", "seq", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("k"))
        .agg(LatestRow.latestRow(struct(col("v")), map(col("v"), col("seq"))).as("r"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("latest_row") ||
      e.getMessage.toLowerCase.contains("order"))
  }

  test("latest_row is correct through the sort-based fallback (threshold exceeded)") {
    // Force ObjectHashAggregate's hash map over its key budget so the
    // remaining input takes the sort-based fallback path — the execution
    // route that exercises buffer serialization for real.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "2")
      val rows = (1L to 400L).map(i => (i % 50, i, s"v$i")) // 50 keys, 8 rows each
      val got = graft.ops.Changelog
        .latestByKey(rows.toDF("k", "seq", "v"), Seq("k"), col("seq"))
        .collect()
        .map(r => (r.getLong(0), r.getString(2)))
        .toMap
      val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.maxBy(_._2)._3 }
      assert(got == expected)
    } finally spark.conf.set(key, prior)
  }

  test("serialize/deserialize round-trips the buffer (the shuffle/spill path)") {
    val payloadType = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val agg = LatestRow(
      BoundReference(0, payloadType, nullable = true),
      BoundReference(1, LongType, nullable = true))
    val buf = agg.createAggregationBuffer()
    val row = InternalRow(
      InternalRow(7L, UTF8String.fromString("payload")), 42L)
    agg.update(buf, row)
    val restored = agg.deserialize(agg.serialize(buf))
    assert(restored.ord == 42L)
    val p = restored.payload.asInstanceOf[InternalRow]
    assert(p.getLong(0) == 7L && p.getUTF8String(1).toString == "payload")
    // merge prefers the higher ordering value regardless of side
    val older = agg.createAggregationBuffer()
    agg.update(older, InternalRow(InternalRow(1L, UTF8String.fromString("old")), 10L))
    val merged = agg.merge(older, restored)
    assert(merged.ord == 42L)
    // empty buffer round-trips to empty
    val empty = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    assert(empty.ord == null && empty.payload == null)
  }
}
