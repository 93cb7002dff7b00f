package graft

/** r22 core-scaling probe (the verdict's item 8): at sf0.1 every query
  * is sub-2 s and overhead-dominated, so the 8→32-core ratio carries no
  * parallelism signal. This probe re-runs a shuffle-heavy query set
  * over the ×8-tiled corpus (ScaleProbe's mutated tiling, so true work
  * grows ~linearly) at a given core count — run it twice (32 then 8)
  * and compare mins; ratios well above 1 on the 8-core pass are the
  * parallelism signal the sf0.1 probe cannot show.
  *
  * Usage:
  *   sbt "Test/runMain graft.CoreScalingProbe prep"         # tile once
  *   sbt "Test/runMain graft.CoreScalingProbe 32 [q,q...]"
  *   sbt "Test/runMain graft.CoreScalingProbe 8  [q,q...]"
  */
object CoreScalingProbe {
  private val tileDir = "/tmp/graft_tile8"
  private val defaultQueries = Seq(
    "q_neardup_jaccard", "q_containment", "q_dup_clusters", "q_tfidf",
    "q_ingest", "q_profile", "q_substring_dedup", "q_lm_score")

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    args.headOption match {
      case Some("prep") =>
        val spark = GraftSession.local("graft-corescale-prep", cores = 32)
        val n = ScaleProbe.tileDocuments(spark, sfDir, tileDir, 8)
        val e = ScaleProbe.tileEmbeddings(spark, sfDir, tileDir, 8)
        // the tiled dir must look like an SF dir for Tables.* readers
        // that the probed queries touch beyond documents/embeddings
        for (t <- Seq("region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events")) {
          val src = new java.io.File(s"$sfDir/$t.parquet")
          if (src.exists()) {
            val dst = new java.io.File(s"$tileDir/$t.parquet")
            if (!dst.exists())
              spark.read.parquet(src.getPath).write.parquet(dst.getPath)
          }
        }
        println(s"CORESCALE prep docs=$n embeddings=$e dir=$tileDir")
        spark.stop()
      case Some(cores) =>
        val names = args.drop(1).headOption
          .map(_.split(",").toSeq).getOrElse(defaultQueries)
        val spark = GraftSession.local("graft-corescale", cores = cores.toInt)
        names.foreach { q =>
          val fn = SparkEntry.queries(q)
          fn(spark, tileDir).write.format("noop").mode("overwrite").save()
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, tileDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"CORESCALE cores=$cores $q min=${ts.min}%.3f iters=${ts.mkString(",")}")
        }
        spark.stop()
      case None => sys.error("usage: CoreScalingProbe prep | <cores> [q,q...]")
    }
  }
}
