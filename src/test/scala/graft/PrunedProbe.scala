package graft

/** Ad-hoc probe for the partition-pruned pull query: checkpoint layout,
  * snapshot availability per commit, FromSnapshotOptions single-partition
  * read, and murmur3 key→partition routing.
  * Run: sbt "Test/runMain graft.PrunedProbe" */
object PrunedProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.streaming.ChangelogStream.configure(spark)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ReplayEv](spark)
    val out = graft.streaming.ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pruned-probe").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    try {
      input.addData((1L to 20L).map(k => ReplayEv(k, k * 10, "insert", k.toDouble)))
      q.processAllAvailable()
      input.addData(Seq(ReplayEv(5L, 999L, "update", 42.0)))
      q.processAllAvailable()

      println("=== checkpoint tree (state + commits) ===")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
        .map(_.toString.stripPrefix(ckpt))
        .filter(p => p.contains("/state") || p.contains("/commits"))
        .toSeq.sorted.take(80).foreach(println)

      val nParts = new java.io.File(s"$ckpt/state/0").listFiles()
        .count(f => f.isDirectory && f.getName.forall(_.isDigit))
      println(s"nParts=$nParts")

      val full = spark.read.format("statestore").option("path", ckpt).load()
      println("=== full schema ===")
      full.printSchema()
      println("full rdd partitions = " + full.rdd.getNumPartitions)
      println("=== full with partition_id vs pmod(hash(key)) ===")
      full.select(col("key"), col("partition_id"),
          pmod(hash(col("key.value")), lit(nParts)).as("computed"))
        .show(25, truncate = false)

      // last committed batch
      val lastBatch = new java.io.File(s"$ckpt/commits").listFiles()
        .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
      println(s"lastBatch=$lastBatch")

      // try a single-partition snapshot read for key 5's partition
      val p = spark.range(1).select(pmod(hash(lit(5L)), lit(nParts))).head().getInt(0)
      println(s"key 5 routes to partition $p")
      val pruned = spark.read.format("statestore")
        .option("path", ckpt)
        .option("batchId", lastBatch)
        .option("snapshotStartBatchId", lastBatch)
        .option("snapshotPartitionId", p)
        .load()
      println("pruned rdd partitions = " + pruned.rdd.getNumPartitions)
      pruned.select(col("key"), col("value.groupState.*"), col("partition_id"))
        .show(25, truncate = false)
    } finally q.stop()
    spark.stop()
  }
}
