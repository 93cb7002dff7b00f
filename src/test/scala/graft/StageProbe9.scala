package graft
import org.apache.spark.sql.functions._
object StageProbe9 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe9", cores = 32)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val a = li.select(col("l_tax")).where(col("l_tax").isNotNull).distinct()
      .agg(count(lit(1)).as("d"))
    val b = li.select(col("l_tax")).where(col("l_tax").isNotNull).distinct()
      .agg(count(lit(1)).as("d"), approx_count_distinct(col("l_tax"), 0.01).as("a"))
    a.collect(); b.collect()
    println("=== distinct_only ==="); println(a.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    println("=== distinct+hll ==="); println(b.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
