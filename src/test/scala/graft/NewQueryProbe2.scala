package graft

/** Ad-hoc probe: warm min-of-3 of the round-5 query additions. */
object NewQueryProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local("graft-probe2", cores = cores)
    Seq("q_curate", "q_neardup_dedup").foreach { n =>
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE2 $n%-18s ${ts.min}%6.2f s (${ts.mkString(", ")})")
    }
    spark.stop()
  }
}
