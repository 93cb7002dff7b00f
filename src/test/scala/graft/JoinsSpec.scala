package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkTestBase {

  import spark.implicits._

  test("saltedJoin returns exactly the unsalted join's rows on skewed data") {
    // 90% of the fact rows share one key — the shape that melts a single
    // reducer in an unsalted shuffle join.
    val fact = ((1 to 900).map(i => (1L, s"evt$i")) ++ (1 to 100).map(i => ((i % 7 + 2).toLong, s"t$i")))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (9L, "unmatched"))
      .toDF("dk", "name")
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    val salted = Joins.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    assert(salted.sortBy(_.toString) == plain.sortBy(_.toString))
    assert(plain.count(_.head == 1L) == 900) // every hot-key row matched exactly once
  }

  test("saltedJoin works when the fact side carries a MAP column (r20 review finding)") {
    // Spark's hash functions reject MapType at analysis time; the skew
    // escape hatch previously hashed struct(ALL columns) and threw on
    // exactly the map-carrying event tables it exists for
    val fact = Seq(
      (1L, Map("a" -> "1"), "e1"), (1L, Map("b" -> "2"), "e2"),
      (2L, Map.empty[String, String], "e3")).toDF("k", "props", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("dk", "name")
    val got = Joins.saltedJoin(fact, dim, "k", "dk", salts = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    val want = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSeq
    assert(got.sortBy(_.toString) == want.sortBy(_.toString))
  }

  test("saltedJoin with salts=1 degenerates to the plain join") {
    val fact = Seq((1L, "x"), (2L, "y")).toDF("k", "p")
    val dim = Seq((1L, "a")).toDF("dk", "n")
    val got = Joins.saltedJoin(fact, dim, "k", "dk", salts = 1).collect()
    assert(got.length == 1 && got(0).getAs[String]("p") == "x")
  }

  test("revenueByNation broadcasts the dimension side") {
    val plan = Joins.revenueByNation(
      Tables.orders(spark, sf001),
      Tables.customer(spark, sf001),
      Tables.nation(spark, sf001)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
