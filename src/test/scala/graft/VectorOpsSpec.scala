package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends SparkTestBase {

  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(-1.0f, 0.5f, 2.0f)

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq((a, b)).toDF("a", "b").select(c).collect()(0)

  test("dot product matches plain Scala") {
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(math.abs(one(VectorOps.dot(col("a"), col("b"))).getDouble(0) - expected) < 1e-12)
  }

  test("l2Norm matches plain Scala") {
    val expected = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(one(VectorOps.l2Norm(col("a"))).getDouble(0) - expected) < 1e-12)
  }

  test("cosine of identical vectors is 1") {
    val got = Seq((a, a)).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("cosine with a zero vector is NULL, not NaN") {
    val z = Array(0.0f, 0.0f, 0.0f)
    assert(Seq((a, z)).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("l2Distance matches plain Scala") {
    val expected = math.sqrt(a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d
    }.sum)
    assert(math.abs(one(VectorOps.l2Distance(col("a"), col("b"))).getDouble(0) - expected) < 1e-12)
  }

  test("normalize yields unit norm and preserves direction; zero vector unchanged") {
    val n = one(VectorOps.l2Norm(VectorOps.normalize(col("a")))).getDouble(0)
    assert(math.abs(n - 1.0) < 1e-6) // float storage → float tolerance
    val z = Array(0.0f, 0.0f)
    val zn = Seq(Tuple1(z)).toDF("a")
      .select(VectorOps.normalize(col("a"))).collect()(0).getSeq[Float](0)
    assert(zn == Seq(0.0f, 0.0f))
  }

  test("cosine-on-normalized equals dot-on-normalized (ingest-time optimization)") {
    val df = Seq((a, b)).toDF("a", "b")
      .select(VectorOps.normalize(col("a")).as("na"), VectorOps.normalize(col("b")).as("nb"))
    val viaCos = df.select(VectorOps.cosine(col("na"), col("nb"))).collect()(0).getDouble(0)
    val viaDot = df.select(VectorOps.dot(col("na"), col("nb"))).collect()(0).getDouble(0)
    assert(math.abs(viaCos - viaDot) < 1e-6)
  }

  test("HOF cosine is bit-identical to the native CosineSim kernel (independent cross-check)") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 50).map { i =>
      (Array.fill(64)(rnd.nextGaussian().toFloat), Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("a", "b")
    val pairs = df.select(
      VectorOps.cosine(col("a"), col("b")).as("hof"),
      graft.functions.native.cosineSim(col("a"), col("b")).as("native"))
      .collect()
    pairs.foreach { r => assert(r.getDouble(0) == r.getDouble(1)) }
  }
}
