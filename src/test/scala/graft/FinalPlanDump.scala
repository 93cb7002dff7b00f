package graft

/** Dumps the FINAL adaptive (post-execution) plan of the named queries —
  * explain("formatted") shows the initial AQE plan, which cannot show
  * runtime exchange reuse; this runs the query via a noop write and
  * prints the executed plan with its ReusedExchange nodes (test scope,
  * r22 evidence tool). Usage:
  * `sbt "Test/runMain graft.FinalPlanDump q_x[,q_y...] [cores]"` */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_neardup_jaccard").split(",")
    val cores = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(8)
    val spark = GraftSession.local("graft-final-plan", cores = cores)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
      df.collect()
      println(s"===== $n (final adaptive plan) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
