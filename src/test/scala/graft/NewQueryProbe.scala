package graft

/** Ad-hoc probe: per-query timing of the round-3 additions at a given SF.
  * Run: sbt "Test/runMain graft.NewQueryProbe /root/testdata/sf0.1" */
object NewQueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val names = Seq(
      "q_dedup_norm", "q_neardup_jaccard", "q_neardup_minhash",
      "q_neardup_simhash", "q_neardup_embedding", "q_sim_topk_lsh",
      "q_neardup_winnow", "q_token_bpe")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $n%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
