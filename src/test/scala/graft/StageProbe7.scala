package graft

import org.apache.spark.sql.functions._

/** r22 q_semdedup stage breakdown: training (driver-side k-means) vs
  * assignment+bucket-join+verify vs component collapse. */
object StageProbe7 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe7", cores = 32)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGEPROBE7 $name ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    (1 to 2).foreach { round =>
      val cents = t(s"r$round:trainCentroids")(
        ops.Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2048, 10))
      val assigned = emb.select(
        col("vec_id").as("id"),
        explode(functions.native.nearestCentroids(col("embedding"), cents, 4)).as("bucket"))
      val rawCands = assigned.select(col("bucket"), col("id").as("id1"))
        .join(assigned.select(col("bucket"), col("id").as("id2")), Seq("bucket"))
        .filter(col("id1") < col("id2")).select(col("id1"), col("id2"))
      val vecs = emb.select(col("vec_id").as("__id"), col("embedding").as("__vec"))
      val pairs = rawCands
        .join(vecs.select(col("__id").as("id1"), col("__vec").as("v1")), "id1")
        .join(vecs.select(col("__id").as("id2"), col("__vec").as("v2")), "id2")
        .select(col("id1"), col("id2"),
          functions.native.cosineSim(col("v1"), col("v2")).as("cos_sim"))
        .filter(col("cos_sim") >= 0.5).select(col("id1"), col("id2")).distinct()
      t(s"r$round:candidates+verify")(
        pairs.write.format("noop").mode("overwrite").save())
      t(s"r$round:collapse")(
        ops.NearDup.collapseNearDups(emb, "vec_id", pairs).select(col("vec_id"))
          .orderBy(col("vec_id")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
