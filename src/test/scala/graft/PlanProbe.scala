package graft
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-plan-probe", cores = 4)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val threshold = 0.8
    val p = docs.select(col("doc_id").as("id"),
        graft.functions.native.shingleHashes(col("text"), 3).as("__h"))
      .select(col("id"), size(col("__h")).as("n"), col("__h"))
      .select(col("id"), col("n"),
        explode(slice(col("__h"), lit(1),
          (col("n") - ceil(col("n") * (threshold * (1 - 1e-12)) - lit(1e-9)) + 1)
            .cast("int"))).as("h"))
    val sizeOk = col("n1") * (0.8 * (1 - 1e-12)) <= col("n2") &&
      col("n2") * (0.8 * (1 - 1e-12)) <= col("n1")
    val j = p.select(col("h"), col("id").as("id1"), col("n").as("n1")).hint("merge")
      .join(p.select(col("h"), col("id").as("id2"), col("n").as("n2")), "h")
      .filter(col("id1") < col("id2") && sizeOk)
      .select(col("id1"), col("id2")).distinct()
    j.collect()
    println("=== FINAL PLAN (executed, AQE) ===")
    println(j.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
