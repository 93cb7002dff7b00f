package graft

/** Ad-hoc probe: candidate volume + plan shape of exactJaccardPairs. */
object ExplainJac {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-explain-jac", cores = 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val cands = graft.ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8)
    println("CANDIDATE PAIRS: " + cands.count())
    val full = graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    println("RESULT PAIRS: " + full.count())
    spark.stop()
  }
}
