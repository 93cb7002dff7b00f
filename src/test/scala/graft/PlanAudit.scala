package graft

/** One-off plan dumper (test scope): prints the formatted physical plan
  * of the named queries at the given sf — the `.explain("formatted")`
  * audit loop without a REPL. Usage:
  * `sbt "Test/runMain graft.PlanAudit q_pricing[,q_x...] [sfDir]"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_pricing").split(",")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-plan-audit", cores = 4)
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
