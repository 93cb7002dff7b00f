package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** The documented 100 TB swap-ins (PLANS.md / operator scaladoc) claim
  * that an approximate, map-side-combinable operator can stand in for
  * the exact one when bounded error is acceptable. This suite holds
  * those claims to their bounds on the fixture — so the swap-in advice
  * is tested, not aspirational. */
class SwapInSpec extends SparkTestBase {

  test("approx_percentile stands in for exact discrete quantiles (documented swap-in)") {
    val docs = Tables.documents(spark, sf01)
    val exact = Relational
      .groupQuantilesDisc(docs, "lang", "n_chars", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // accuracy 10000 => rank error <= n/10000; fixture groups are ~100
    // docs, so the approx quantile must land ON an exact rank neighbor
    val approx = docs
      .groupBy(col("lang"))
      .agg(
        percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("n_chars"), lit(0.9), lit(10000)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    for (l <- exact.keySet) {
      val sorted = docs.filter(col("lang") === l).select("n_chars")
        .collect().map(_.getLong(0)).sorted
      def rankOf(v: Long) = sorted.indexOf(v)
      // within 1% of the group size in rank distance
      val slack = math.max(1, sorted.length / 100)
      assert(math.abs(rankOf(approx(l)._1) - rankOf(exact(l)._1)) <= slack, s"$l p50")
      assert(math.abs(rankOf(approx(l)._2) - rankOf(exact(l)._2)) <= slack, s"$l p90")
    }
  }

  test("approx_count_distinct stands in for the exact profile cardinalities") {
    val docs = Tables.documents(spark, sf01)
    val r = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text"), 0.02).as("approx"))
      .collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    // rsd 0.02 => generous 3-sigma band of 6%
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"approx $approx vs exact $exact")
  }
}
