package graft

object ExplainJac {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-explain-jac", cores = 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val full = graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    full.write.format("noop").mode("overwrite").save()
    val plan = full.queryExecution.executedPlan.toString
    println("WINDOW_OPS=" + "Window \\[".r.findAllIn(plan).length)
    println("OHA_OPS=" + "ObjectHashAggregate".r.findAllIn(plan).length)
    println("REUSED=" + "ReusedExchange".r.findAllIn(plan).length)
    println("SHJ=" + "ShuffledHashJoin".r.findAllIn(plan).length)
    println("BHJ=" + "BroadcastHashJoin".r.findAllIn(plan).length)
    println("SMJ=" + "SortMergeJoin".r.findAllIn(plan).length)
    spark.stop()
  }
}
