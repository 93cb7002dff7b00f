package graft

import org.apache.spark.sql.functions._
import graft.sources.ParquetChangeSource

/** B6 offset-reset semantics on the parquet-backed changelog source. */
class ChangeSourceSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-source-test").toString
    (1L to 10L).map(o => (o, s"payload-$o")).toDF("offset", "data")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("earliest replays everything") {
    assert(new ParquetChangeSource(path).read(spark, Some("earliest")).count() == 10)
  }

  test("no override reads from the source's configured default (earliest)") {
    assert(new ParquetChangeSource(path).read(spark).count() == 10)
  }

  test("latest sees nothing new in a static snapshot") {
    assert(new ParquetChangeSource(path).read(spark, Some("latest")).count() == 0)
  }

  test("numeric offset resumes inclusively and prunes at the scan") {
    val df = new ParquetChangeSource(path).read(spark, Some("7"))
    assert(df.select(min(col("offset"))).collect()(0).getLong(0) == 7L)
    assert(df.count() == 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(offset,7)"), plan)
  }
}
