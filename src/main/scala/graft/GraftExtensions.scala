package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` — build-time injection
  * of the engine's native SQL functions ([[graft.functions
  * .GraftFunctions]]). Lives in package `graft` so the FQCN every doc
  * names (README, SURVEY §5) is the class that actually loads — it
  * previously sat in `graft.functions`, so following the docs threw
  * ClassNotFoundException at session build (r20 review finding);
  * GraftFunctionsSpec now loads it reflectively by the documented
  * string, exactly like Spark's extension loader does. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
