package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** File-corpus ingestion with corrupt-row QUARANTINE — the boundary a
  * crawl/export pipeline actually crosses: JSONL (and CSV) dumps always
  * contain malformed lines, and the two default behaviors are both
  * wrong at scale (FAILFAST kills a 100 TB job for one bad line;
  * silent DROPMALFORMED makes data loss invisible). This reader splits
  * the input into (good rows, quarantined raw lines) so the pipeline
  * keeps running AND the loss is observable, bounded, and replayable.
  *
  * Scale shape: one pass — Spark's PERMISSIVE mode parses per row and
  * fills the corrupt-record column for failures; good/quarantine are
  * two filters over the same scan (no shuffle). The quarantine carries
  * the RAW line, so a fixed parser can re-ingest it later. */
object CorpusSource {

  /** Parsed corpus + quarantine from a JSONL directory/file.
    * `schema` is the EXPECTED document schema (schema-on-read: fields
    * missing from a line are NULL; a syntactically broken line goes to
    * quarantine whole). Returns (good, quarantine): `good` has exactly
    * the schema's columns; `quarantine` is one `raw` string column. */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not already contain the _corrupt marker column")
    val withMarker = StructType(schema.fields :+ StructField("_corrupt", StringType))
    val parsed = spark.read
      .schema(withMarker)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      // the corrupt column is populated lazily from the raw line; cache
      // the parsed frame so the good/quarantine split shares one parse
      // and Spark's "queries on the internal corrupt column alone"
      // restriction is never hit
      .cache()
    val good = parsed
      .filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = parsed
      .filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw"))
    (good, quarantine)
  }
}
