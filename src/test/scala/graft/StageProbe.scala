package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for the near-dup family (test scope, r22): times
  * named sub-stages of the expensive pipelines with the same
  * warm + min-of-3 noop protocol as QuickTime, so a rewrite can be
  * aimed at the stage that actually costs. Usage:
  * `sbt "Test/runMain graft.StageProbe [cores]"` */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.local("graft-stage-probe", cores = cores)
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGEPROBE $name min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }

    time("jaccard_candidates")(
      ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8))
    time("jaccard_full")(
      ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    time("collapse_full") {
      ops.NearDup.collapseNearDups(docs, "doc_id",
        ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8))
        .select(col("doc_id"))
    }
    time("winnow_filtered_only")(
      docs.select(col("doc_id").as("id"),
          ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
        .select(col("id"), explode(col("__fp")).as("f")))

    // candidate-stage variants (r22): one kernel pass via localCheckpoint
    def prefixPlan = {
      val threshold = 0.8
      docs.select(col("doc_id").as("id"),
          graft.functions.native.shingleHashes(col("text"), 3).as("__h"))
        .select(col("id"), size(col("__h")).as("n"), col("__h"))
        .select(col("id"), col("n"),
          explode(slice(col("__h"), lit(1),
            (col("n") - ceil(col("n") * (threshold * (1 - 1e-12)) - lit(1e-9)) + 1)
              .cast("int"))).as("h"))
    }
    def sizeOk = col("n1") * (0.8 * (1 - 1e-12)) <= col("n2") &&
      col("n2") * (0.8 * (1 - 1e-12)) <= col("n1")
    time("cand_ckpt_once") {
      val p = prefixPlan.localCheckpoint()
      p.select(col("h"), col("id").as("id1"), col("n").as("n1"))
        .join(p.select(col("h"), col("id").as("id2"), col("n").as("n2")), "h")
        .filter(col("id1") < col("id2") && sizeOk)
        .select(col("id1"), col("id2"))
        .distinct()
    }
    time("cand_merge_reuse") {
      val p = prefixPlan
      p.select(col("h"), col("id").as("id1"), col("n").as("n1")).hint("merge")
        .join(p.select(col("h"), col("id").as("id2"), col("n").as("n2")), "h")
        .filter(col("id1") < col("id2") && sizeOk)
        .select(col("id1"), col("id2"))
        .distinct()
    }
    spark.stop()
  }
}
