package graft

import org.apache.spark.sql.functions._

/** r22 q_profile_approx breakdown: the stats aggregate vs each
  * column's distinct+HLL aggregate — is the HLL++ buffer still the
  * cost center after the r21 distinct-values feed? */
object StageProbe8 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe8", cores = 32)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGEPROBE8 $name min=${ts.min}%.3f iters=${ts.mkString(",")}")
    }
    cols.foreach { c =>
      time(s"distinct_only:$c")(
        li.select(col(c)).where(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as("d")))
      time(s"distinct+hll:$c")(
        li.select(col(c)).where(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as("d"), approx_count_distinct(col(c), 0.01).as("a")))
    }
    time("full_query")(ops.Relational.profileApproxChecked(li, cols, 0.01, 0.05))
    spark.stop()
  }
}
