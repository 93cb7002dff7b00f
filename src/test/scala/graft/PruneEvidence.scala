package graft

import org.apache.spark.sql.functions._

/** r22 evidence tool: dumps the final adaptive plan of the MinHash
  * near-dup pipeline with `spark.graft.neardup.pruneVerify=true`, to
  * show the semi-join pruning branch and the candidate subtree's
  * runtime exchange reuse. */
object PruneEvidence {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-prune-evidence", cores = 8)
    spark.conf.set("spark.graft.neardup.pruneVerify", "true")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val df = ops.NearDup
      .minhashNearDupPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
    df.collect()
    println("===== minhashNearDupPairs pruneVerify=true (final adaptive plan) =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
