package graft

import org.apache.spark.sql.functions._

/** r22 probe #2: isolate collapseNearDups' own cost from the pair
  * pipeline by feeding it pre-materialized pairs. */
object StageProbe2 {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.local("graft-stage-probe2", cores = cores)
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val pairsM = ops.NearDup
      .exactJaccardPairs(docs, "doc_id", "text", 3, 0.8).localCheckpoint()
    println(s"pairs rows = ${pairsM.count()}")
    val ids = pairsM.select(col("id1")).union(pairsM.select(col("id2"))).distinct().count()
    val nDocs = docs.count()
    println(s"paired ids = $ids of $nDocs docs")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGEPROBE2 $name min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }
    time("collapse_on_materialized_pairs")(
      ops.NearDup.collapseNearDups(docs, "doc_id", pairsM).select(col("doc_id")))
    time("clusters_on_materialized_pairs")(
      ops.NearDup.nearDupClusters(docs, "doc_id", pairsM))
    spark.stop()
  }
}
