package graft

/** Ad-hoc probe: state-replay throughput re-reading a PERSISTED parquet
  * log through the file streaming source (the shipped protocol), vs the
  * round-3..5 MemoryStream feed. The MemoryStream batch plan embeds all
  * 1 M rows, so every task deserializes a ~62 MiB task binary — it
  * measured the harness, not the state operator (observed here: ~100K
  * vs ~600K msgs/s for identical state work). A file-source replay reads
  * the log like a real recovery does (the reference's scenario is a
  * ksqlDB rebuild re-reading the TOPIC, i.e. persisted storage).
  * Run: sbt "Test/runMain graft.FileReplayProbe" */
object FileReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-file-replay-probe", cores = 32)
    import spark.implicits._
    graft.streaming.ChangelogStream.configure(spark)

    val log = java.nio.file.Files.createTempDirectory("graft-replay-log")
    val n = Replay.writeTiledLog(spark, sfDir, log.toString)

    (1 to 4).foreach { i =>
      val rate = n / Replay.replayLogOnce(spark, log.toString)
      println(f"REPLAYPROBE file-source  run$i: $rate%,.0f msgs/s")
    }

    // the superseded MemoryStream protocol, kept for comparison
    val events = spark.read.parquet(log.toString)
      .selectExpr("user_id", "event_id", "event_type", "value")
      .as[ReplayEv].collect()
    def memOnce(): Double = {
      System.gc()
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ReplayEv](spark)
      val out = graft.streaming.ChangelogStream
        .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-mem-replay")
      events.grouped(10000).foreach(c => input.addData(c.toSeq))
      val t0 = System.nanoTime()
      val q = out.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .format("noop")
        .start()
      try { q.processAllAvailable(); (System.nanoTime() - t0) / 1e9 }
      finally { q.stop(); Replay.wipe(ckpt) }
    }
    (1 to 4).foreach { i =>
      println(f"REPLAYPROBE memorystream run$i: ${n / memOnce()}%,.0f msgs/s")
    }

    Replay.wipe(log)
    spark.stop()
  }
}
