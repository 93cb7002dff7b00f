package graft
import org.apache.spark.sql.functions._
object StageProbe10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe10", cores = 32)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGEPROBE10 $name min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }
    for (rsd <- Seq(0.01, 0.02, 0.05, 0.2)) {
      time(s"hll_rsd=$rsd")(
        li.select(col("l_tax")).where(col("l_tax").isNotNull).distinct()
          .agg(count(lit(1)).as("d"), approx_count_distinct(col("l_tax"), rsd).as("a")))
    }
    // hll alone without the count column (does pairing matter?)
    time("hll_only_rsd=0.01")(
      li.select(col("l_tax")).where(col("l_tax").isNotNull).distinct()
        .agg(approx_count_distinct(col("l_tax"), 0.01).as("a")))
    spark.stop()
  }
}
