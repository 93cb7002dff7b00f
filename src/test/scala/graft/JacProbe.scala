package graft

/** Ad-hoc probe: warm min-of-3 timing of q_neardup_jaccard stages.
  * Run: sbt "Test/runMain graft.JacProbe /root/testdata/sf0.1" */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("graft-jac-probe", cores = cores)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JACPROBE $name%-18s ${runs.min}%8.2f s (${runs.mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    // warm-up
    graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .write.format("noop").mode("overwrite").save()
    time("cands")(graft.ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8))
    time("full")(graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    time("minhash")(graft.ops.NearDup.minhashNearDupPairs(docs, "doc_id", "text", 3, 0.8))
    spark.stop()
  }
}
