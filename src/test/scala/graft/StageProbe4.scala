package graft
import org.apache.spark.sql.functions._
object StageProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe4", cores = 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val cands = ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8)
      .localCheckpoint()
    val nPairs = cands.count()
    val nIds = cands.select(col("id1")).union(cands.select(col("id2"))).distinct().count()
    println(s"SP4 candidates=$nPairs distinct_ids=$nIds docs=${docs.count()}")
    // minhash candidates too
    val mc = ops.NearDup.minhashCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
      .localCheckpoint()
    println(s"SP4 minhash_candidates=${mc.count()} distinct_ids=${mc.select(col("id1")).union(mc.select(col("id2"))).distinct().count()}")
    spark.stop()
  }
}
