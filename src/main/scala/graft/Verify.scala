package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The dump body, session-agnostic so VerifySpec can pin the driver-
    * resilience contract (a failing query prints and is skipped — never
    * aborts the run; oracle_sql.json is written regardless) without
    * main()'s getOrCreate/stop touching the shared test session. */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      only: Option[Set[String]] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = Json.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query filter for focused local
    // re-verification of just-landed operators (the driver passes 2)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Option.empty[Set[String]])
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
      case other => sys.error( // exhaustive: a bare MatchError named no usage (r20)
        s"usage: graft.Verify <sfDir> <outDir> [queryFilter] — got ${other.length} args")
    }
    val spark = GraftSession.localFromEnv("graft-verify")
    run(spark, sfDir, outDir, only)
    spark.stop()
  }
}
