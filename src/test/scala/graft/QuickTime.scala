package graft

/** Focused one-query timer (test scope): warm pass + min-of-3 noop
  * writes at sf0.1 — the quick feedback loop for a single operator's
  * perf work without the full Bench protocol (which pays the replay
  * fork and the 118-query sweep). Usage:
  * `sbt "Test/runMain graft.QuickTime q_quantize[,q_x...] [cores]"` —
  * pass cores=32 to reproduce Bench's session shape when adjudicating
  * a cross-round `regressed` flag (the 4-core default is NOT
  * comparable to Bench figures). */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val cores = args.drop(1).headOption.map { a =>
      a.toIntOption.getOrElse(sys.error(
        s"second arg must be a core count (got '$a'); queries go comma-separated in the FIRST arg"))
    }.getOrElse(4)
    val spark = GraftSession.local("graft-quicktime", cores = cores)
    val names = args.headOption.getOrElse("q_quantize").split(",")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QUICKTIME $n min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }
    spark.stop()
  }
}
