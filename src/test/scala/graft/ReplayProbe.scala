package graft

/** Ad-hoc probe: replay-throughput comparison of MemoryStream feeding
  * strategies. Run: sbt "Test/runMain graft.ReplayProbe" */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-replay-probe", cores = 32)
    import spark.implicits._
    graft.streaming.ChangelogStream.configure(spark)
    val base = Tables
      .events(spark, "/root/testdata/sf0.1")
      .selectExpr("user_id", "event_id", "event_type", "value")
      .as[ReplayEv]
      .collect()
    val copies = math.max(1, (1000000 + base.length - 1) / base.length)
    val span = base.iterator.map(_.event_id).max + 1
    val events = Array.tabulate(copies * base.length) { i =>
      val e = base(i % base.length)
      e.copy(event_id = e.event_id + (i / base.length).toLong * span)
    }
    def run(name: String)(feed: (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ReplayEv], () => org.apache.spark.sql.streaming.StreamingQuery) => (Long, Double)): Unit = {
      val rates = (1 to 2).map { _ =>
        System.gc()
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ReplayEv](spark)
        val out = graft.streaming.ChangelogStream
          .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-replay-probe")
        val mkQ = () => out.writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .format("noop")
          .start()
        val (n, sec) = feed(input, mkQ)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        n / sec
      }
      println(f"REPLAYPROBE $name%-28s ${rates.max}%,.0f msgs/s (${rates.map(r => f"$r%,.0f").mkString(", ")})")
    }

    run("single-block, post-start") { (input, mkQ) =>
      val q = mkQ()
      try {
        input.addData(events.toSeq)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (events.length.toLong, (System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }
    run("100x10K blocks, pre-start") { (input, mkQ) =>
      events.grouped(10000).foreach(c => input.addData(c.toSeq))
      val t0 = System.nanoTime()
      val q = mkQ()
      try {
        q.processAllAvailable()
        (events.length.toLong, (System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }
    run("single-block, pre-start") { (input, mkQ) =>
      input.addData(events.toSeq)
      val t0 = System.nanoTime()
      val q = mkQ()
      try {
        q.processAllAvailable()
        (events.length.toLong, (System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }
    run("32x~31K blocks, pre-start") { (input, mkQ) =>
      events.grouped(31250).foreach(c => input.addData(c.toSeq))
      val t0 = System.nanoTime()
      val q = mkQ()
      try {
        q.processAllAvailable()
        (events.length.toLong, (System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }
    spark.stop()
  }
}
