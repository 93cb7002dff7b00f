package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries
import graft.ops.Relational

/** The Misra–Gries guarantees, tested as theorems: exactness below
  * capacity, the ⌊n/(capacity+1)⌋ undercount bound and guaranteed
  * capture above it (under eviction pressure and any partitioning),
  * and the checked heavy-hitters harness whose audit booleans those
  * theorems make deterministically true. */
class MisraGriesSpec extends SparkTestBase {

  import spark.implicits._

  private def sketch(keys: Seq[String], capacity: Int, partitions: Int): Map[String, Long] =
    keys.toDF("k").repartition(partitions)
      .agg(MisraGries.mgSketch(col("k"), capacity).as("sk"))
      .selectExpr("explode(sk) AS e")
      .select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("capacity >= distinct keys makes the sketch exact at any partitioning") {
    val keys = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    for (p <- Seq(1, 3, 8)) {
      assert(sketch(keys, capacity = 8, partitions = p) ==
        Map("a" -> 7L, "b" -> 4L, "c" -> 2L), s"partitions=$p")
    }
  }

  test("undercount bound and guaranteed capture hold under eviction, any partitioning") {
    // 40 distinct light keys + 3 heavy keys, capacity 8 → heavy
    // eviction traffic; n = 40 + 60+45+30 = 175, bound = 175/9 = 19
    val rnd = new scala.util.Random(5)
    val keys = rnd.shuffle(
      (1 to 40).map(i => s"light$i") ++
        Seq.fill(60)("heavyA") ++ Seq.fill(45)("heavyB") ++ Seq.fill(30)("heavyC"))
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = keys.size / 9
    for (p <- Seq(1, 4, 16)) {
      val est = sketch(keys, capacity = 8, partitions = p)
      est.foreach { case (k, e) =>
        val t = truth(k)
        assert(e <= t && t - e <= bound, s"p=$p key=$k est=$e true=$t bound=$bound")
      }
      truth.foreach { case (k, t) =>
        if (t > bound) assert(est.contains(k), s"p=$p heavy key $k (true=$t) missing")
      }
    }
  }

  test("heavyHittersChecked: exact surface + deterministically-true audit flags") {
    val events = Tables.events(spark, sf001)
    val checked = Relational.heavyHittersChecked(events, "user_id", topK = 10, capacity = 16)
      .collect()
    assert(checked.length == 10)
    assert(checked.forall(_.getAs[Boolean]("sketch_ok")),
      "an MG theorem failed — the sketch implementation is broken")
    val exact = Relational.heavyHitters(events, "user_id", topK = 10)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_rows")))
    assert(checked.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_rows"))).toSeq
      == exact.toSeq, "the checked surface must be the exact top-k")
  }

  test("checked harness survives heavy eviction — absent keys audit through the NULL path") {
    // capacity 2 over ~dozens of users: most top-k keys are NOT in the
    // sketch; their audit must take the n_rows <= bound branch (ANSI
    // element_at on the empty match array was the round-12 regression)
    val events = Tables.events(spark, sf001)
    val rows = Relational.heavyHittersChecked(events, "user_id", topK = 10, capacity = 2)
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Boolean]("sketch_ok")),
      "the MG bound must hold even when the key was evicted")
  }

  test("null keys are ignored by the sketch") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val got = df.agg(MisraGries.mgSketch(col("k"), 4).as("sk"))
      .selectExpr("explode(sk) AS e").select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L))
  }

  test("keys past writeUTF's 64 KiB ceiling survive buffer serialization") {
    // multi-partition agg forces partial-buffer serialize/deserialize;
    // writeUTF would throw UTFDataFormatException at 65 536 encoded
    // bytes — the length-prefixed codec must not
    val big = "x" * 70000
    val keys = Seq.fill(5)(big) ++ Seq.fill(3)("small")
    assert(sketch(keys, capacity = 4, partitions = 4) ==
      Map(big -> 5L, "small" -> 3L))
  }

  test("checked harness excludes NULL keys from BOTH sides (domains match)") {
    // a NULL key heavier than the MG bound would flip sketch_ok=false
    // if the exact side kept it — the declared domain is non-NULL keys
    val df = (Seq.fill[Option[String]](50)(None) ++
      Seq.fill(10)(Some("a")) ++ Seq.fill(4)(Some("b"))).toDF("k")
    val rows = Relational.heavyHittersChecked(df, "k", topK = 5, capacity = 8)
      .collect()
    assert(rows.length == 2, "NULL group must not appear in the exact surface")
    assert(rows.forall(_.getAs[Boolean]("sketch_ok")))
    // shares divide the non-NULL total (14), not the raw row count (64)
    assert(rows.map(_.getAs[Double]("share")).sum == 1.0)
  }
}
