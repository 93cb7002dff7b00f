package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Ad-hoc probe: job count of collapseNearDups (pins the one-job-per-round
  * claim) and the q_neardup_embedding executed plan (for PlanSpec
  * assertions). Run: sbt "Test/runMain graft.CollapseJobsProbe" */
object CollapseJobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-collapse-probe", cores = 4)
    import spark.implicits._
    val sc = spark.sparkContext

    val docs = (0L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = ((1L until 30L).map(i => (i, i + 1)) :+ (30L, 0L)).toDF("id1", "id2")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    // warm-up (codegen etc.) outside the counted window
    graft.ops.NearDup.collapseNearDups(docs, "doc_id", chain).count()
    sc.addSparkListener(listener)
    try {
      graft.ops.NearDup.collapseNearDups(docs, "doc_id", chain).count()
      org.apache.spark.GraftSparkTestHooks.flushListeners(sc)
      println(s"COLLAPSEJOBS 31-node-chain (31 rounds): ${jobs.get} jobs")
      jobs.set(0)
      val tri = Seq((3L, 4L), (3L, 8L), (4L, 8L)).toDF("id1", "id2")
      graft.ops.NearDup.collapseNearDups(docs, "doc_id", tri).count()
      org.apache.spark.GraftSparkTestHooks.flushListeners(sc)
      println(s"COLLAPSEJOBS triangle (2 rounds): ${jobs.get} jobs")
    } finally sc.removeSparkListener(listener)

    println("=== q_neardup_embedding executedPlan (sf0.001) ===")
    println(SparkEntry.queries("q_neardup_embedding")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
