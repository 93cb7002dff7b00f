package graft

/** Ad-hoc probe: can the state data source read a RUNNING
  * flatMapGroupsWithState changelog's state? Run:
  * sbt "Test/runMain graft.StateStoreProbe" */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.streaming.ChangelogStream.configure(spark)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ReplayEv](spark)
    val out = graft.streaming.ChangelogStream
      .latestByKey[Long, ReplayEv](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-statestore-probe").toString
    val q = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .start()
    try {
      input.addData(Seq(
        ReplayEv(1L, 10L, "insert", 1.0),
        ReplayEv(1L, 11L, "update", 2.0),
        ReplayEv(2L, 12L, "insert", 3.0)))
      q.processAllAvailable()
      val state = spark.read.format("statestore").option("path", ckpt).load()
      state.printSchema()
      state.show(truncate = false)
    } finally q.stop()
    spark.stop()
  }
}
