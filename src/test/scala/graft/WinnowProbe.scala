package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc probe: stage costs of winnowPairs (kernel+explode vs df-window
  * stop filter vs self-join+agg).
  * Run: sbt "Test/runMain graft.WinnowProbe /root/testdata/sf0.1 32" */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("graft-winnow-probe", cores = cores)
    def time(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"WINPROBE $name%-14s ${runs.min}%6.2f s (${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    val W = org.apache.spark.sql.expressions.Window
    def fps = docs
      .select(col("doc_id").as("id"),
        graft.ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
      .select(col("id"), explode(col("__fp")).as("f"))
    def filtered = fps
      .withColumn("__df", count(lit(1)).over(W.partitionBy(col("f"))))
      .filter(col("__df") <= 100)
    // warm
    graft.ops.NearDup.winnowPairs(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save()
    time("kernel")(fps)
    time("stopfilter")(filtered)
    time("full")(graft.ops.NearDup.winnowPairs(docs, "doc_id", "text"))
    spark.stop()
  }
}
