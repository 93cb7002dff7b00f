package graft

import org.apache.spark.sql.functions._

/** r22 skew probe for the substringDedup window-vs-aggregate decision:
  * inject a shared 40-token boilerplate block into half the corpus so
  * its ~31 stride-1 window fingerprints each recur in 2 500 docs —
  * the hot-fp regime where the aggregate path's map-side combine and
  * AQE skew-split protect and a per-fp window partition cannot. */
object StageProbe6 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe6", cores = 32)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")
    val skewed = docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit(boiler + " "), col("text"))).otherwise(col("text")).as("text"))
    def run(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val q = ops.TextOps.substringDedup(df, "doc_id", "text", 10)
      q.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGEPROBE6 $tag min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }
    run("substring_skewed", skewed)
    run("substring_clean", docs.select(col("doc_id"), col("text")))
    spark.stop()
  }
}
