package graft

import org.apache.spark.sql.functions._

/** Pins the r22 binary-buffer HLL++ against the built-in
  * `approx_count_distinct`: both delegate to Spark's own
  * HyperLogLogPlusPlusHelper, so the estimates must be BIT-IDENTICAL
  * on every column type the profile flavors feed it — including NULL
  * skipping, empty input, and the multi-partition merge path. */
class HllBinarySpec extends SparkTestBase {
  import spark.implicits._

  test("estimate equals the built-in approx_count_distinct, all paths") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    for (c <- Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax", "l_returnflag")) {
      val row = li.agg(
        approx_count_distinct(col(c), 0.01).as("builtin"),
        graft.functions.HllBinary.approxCountDistinct(col(c), 0.01).as("binary"),
        approx_count_distinct(col(c), 0.05).as("builtin5"),
        graft.functions.HllBinary.approxCountDistinct(col(c), 0.05).as("binary5"))
        .collect()(0)
      assert(row.getLong(0) == row.getLong(1), s"$c rsd=0.01")
      assert(row.getLong(2) == row.getLong(3), s"$c rsd=0.05")
    }
  }

  test("NULLs are skipped and empty input estimates 0, like the built-in") {
    val df = Seq[java.lang.Long](1L, 2L, null, 2L, null, 3L).toDF("v")
    val r = df.agg(
      approx_count_distinct(col("v"), 0.02).as("b"),
      graft.functions.HllBinary.approxCountDistinct(col("v"), 0.02).as("g"))
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    val e = df.filter(col("v").isNull).agg(
      approx_count_distinct(col("v"), 0.02).as("b"),
      graft.functions.HllBinary.approxCountDistinct(col("v"), 0.02).as("g"))
      .collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L)
  }

  test("grouped aggregation (forces serialize/deserialize + merge) matches") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .repartition(16) // many partitions -> real partial merges
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_extendedprice"), 0.01).as("b"),
        graft.functions.HllBinary.approxCountDistinct(col("l_extendedprice"), 0.01).as("g"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }
}
