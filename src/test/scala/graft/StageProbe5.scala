package graft

import org.apache.spark.sql.functions._

/** r22 A/B for the verdict's q_semdedup item: early candidate dedup
  * (distinct before the vector verify) vs the shipped post-verify
  * dedup, at sf0.1 and at ×8 tiled embeddings (nClusters scaled ∝ rows
  * per the operator's own doctrine). */
object StageProbe5 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stage-probe5", cores = 32)
    val dir = "/root/testdata/sf0.1"

    def variants(emb: org.apache.spark.sql.DataFrame, nClusters: Int, tag: String): Unit = {
      val centroids = ops.Similarity.trainCentroids(emb, "vec_id", "embedding", nClusters, 2048, 10)
      val assigned = emb.select(
        col("vec_id").as("id"),
        explode(functions.native.nearestCentroids(col("embedding"), centroids, 4)).as("bucket"))
      def tail(early: Boolean): org.apache.spark.sql.DataFrame = {
        val rawCands = assigned.select(col("bucket"), col("id").as("id1"))
          .join(assigned.select(col("bucket"), col("id").as("id2")), Seq("bucket"))
          .filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"))
        val cands = if (early) rawCands.distinct() else rawCands
        val vecs = emb.select(col("vec_id").as("__id"), col("embedding").as("__vec"))
        val verified = cands
          .join(vecs.select(col("__id").as("id1"), col("__vec").as("v1")), "id1")
          .join(vecs.select(col("__id").as("id2"), col("__vec").as("v2")), "id2")
          .select(col("id1"), col("id2"),
            functions.native.cosineSim(col("v1"), col("v2")).as("cos_sim"))
          .filter(col("cos_sim") >= 0.5)
          .select(col("id1"), col("id2"))
        if (early) verified else verified.distinct()
      }
      Seq(false, true).foreach { early =>
        val name = s"semdedup_${tag}_early=$early"
        tail(early).write.format("noop").mode("overwrite").save()
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          tail(early).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"STAGEPROBE5 $name min=${ts.min}%.3f iters=${ts.mkString(",")}")
      }
    }

    val emb1 = Tables.embeddings(spark, dir)
    println(s"STAGEPROBE5 rows x1 = ${emb1.count()}")
    variants(emb1, 8, "x1")

    val out = java.nio.file.Files.createTempDirectory("graft-semdedup-x8").toString
    ScaleProbe.tileEmbeddings(spark, dir, out, 8)
    val emb8 = spark.read.parquet(s"$out/embeddings.parquet")
      .withColumnRenamed("vec_id", "vec_id")
    println(s"STAGEPROBE5 rows x8 = ${emb8.count()}")
    variants(emb8, 64, "x8")
    FsUtil.rmTree(new java.io.File(out))
    spark.stop()
  }
}
