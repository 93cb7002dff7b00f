package graft
import org.apache.spark.sql.functions._
object StageProbe3 {
  def main(args: Array[String]): Unit = {
    sys.props("graft.debug.rounds") = "true"
    val spark = GraftSession.local("graft-stage-probe3", cores = 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val pairsM = ops.NearDup
      .exactJaccardPairs(docs, "doc_id", "text", 3, 0.8).localCheckpoint()
    (1 to 2).foreach { it =>
      val t0 = System.nanoTime()
      ops.NearDup.collapseNearDups(docs, "doc_id", pairsM).select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      println(f"CLDBG total_collapse iter$it ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
