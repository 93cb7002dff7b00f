package graft

import graft.ops.Similarity

/** Ad-hoc probe (not a test): recall of lshTopK on the fixture across a
  * band/bits grid. Run: sbt "Test/runMain graft.LshProbe" */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val truth = Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    for (bands <- Seq(16, 24, 32); bits <- Seq(2, 3, 4, 6)) {
      val got = Similarity
        .lshTopK(emb, "vec_id", "embedding", 0L, 10, bands, bits)
        .collect().map(_.getLong(0)).toSet
      val recall = truth.count(got.contains) / 10.0
      println(f"bands=$bands%2d bits=$bits recall=$recall%.2f")
    }
    spark.stop()
  }
}
