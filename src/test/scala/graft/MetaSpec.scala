package graft

import graft.ops.Meta
import graft.streaming.ChangelogStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class MetaSpec extends SparkTestBase {

  test("registerTables + listTables is SHOW TABLES over the engine namespace") {
    Meta.registerTables(spark, sf001)
    val names = Meta.listTables(spark).collect().map(_.getString(0)).toSeq
    assert(names == Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier"))
    // idempotent
    Meta.registerTables(spark, sf001)
    assert(Meta.listTables(spark).count() == 10)
  }

  test("activeStreams reflects running continuous queries (SHOW QUERIES)") {
    import spark.implicits._
    assert(Meta.activeStreams(spark).collect().forall(_.getBoolean(2)))
    val input = MemoryStream[Ev](spark)
    val out = ChangelogStream.latestByKey[Long, Ev](input.toDS(), _.user_id, _.event_id)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-meta-test").toString
    val before = Meta.activeStreams(spark).count()
    val q = ChangelogStream.emitChanges(out, ckpt)((_, _) => ())
    try {
      assert(Meta.activeStreams(spark).count() == before + 1)
    } finally q.stop()
    assert(Meta.activeStreams(spark).count() == before)
  }
}
