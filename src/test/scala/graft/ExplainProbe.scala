package graft

/** Ad-hoc probe (not a test): formatted plans of selected queries for the
  * scale audit. Run: sbt "Test/runMain graft.ExplainProbe q_neardup_minhash ..." */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq else Seq("q_neardup_minhash")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
