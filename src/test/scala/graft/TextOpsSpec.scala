package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("tokenCount equals the \\S+-run count on edge cases") {
    val cases = Seq(
      "" -> 0,
      "   " -> 0,
      "\t\n " -> 0,
      "one" -> 1,
      " one " -> 1,
      "one two" -> 2,
      "one  two\tthree\nfour" -> 4,
      "a,b;c" -> 1,
      "  leading and trailing  " -> 3
    )
    val got = cases
      .map(_._1)
      .toDF("text")
      .select(TextOps.tokenCount(col("text")).as("n"))
      .collect()
      .map(_.getInt(0))
      .toSeq
    assert(got == cases.map(_._2))
  }

  test("tokenCount agrees with the regexp_extract_all formulation on fixture docs") {
    val df = Tables.documents(spark, sf001)
    val mismatches = df
      .select(
        TextOps.tokenCount(col("text")).as("fast"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("tokenCount of NULL is NULL") {
    val got = Seq[Option[String]](None)
      .toDF("text")
      .select(TextOps.tokenCount(col("text")))
      .collect()(0)
    assert(got.isNullAt(0))
  }

  test("exactDedup keeps one row per distinct text with the minimum id") {
    val df = Seq(
      (3L, "alpha"), (1L, "alpha"), (2L, "beta"),
      (5L, "beta"), (4L, "gamma")
    ).toDF("doc_id", "text")
    val got = TextOps
      .exactDedup(df, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(got == Set((1L, "alpha"), (2L, "beta"), (4L, "gamma")))
  }

  test("exactDedup result equals group-by-text semantics on the fixture") {
    val docs = Tables.documents(spark, sf001)
    val viaFingerprint = TextOps
      .exactDedup(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val viaText = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .toSet
    assert(viaFingerprint == viaText)
  }

  test("fingerprint is whitespace-normalization-invariant, content-sensitive") {
    val fps = Seq("a  b\tc", " a b c ", "a b d")
      .toDF("text")
      .select(TextOps.fingerprint(col("text")))
      .collect()
      .map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("languageId labels obvious samples and never returns NULL") {
    val samples = Seq(
      "the cat and the dog is with that man" -> "en",
      "der Hund und die Katze ist nicht mit" -> "de",
      "le chat est dans la maison et les arbres" -> "fr",
      "el perro es una mascota que vive en las casas" -> "es",
      "这是一个中文句子的例子" -> "zh",
      "zzzz qqqq xxxx" -> "unknown"
    )
    val got = samples
      .map(_._1)
      .toDF("text")
      .select(TextOps.languageId(col("text")).as("lang"))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got == samples.map(_._2))
  }

  test("qualityFeatures ratios are exact on a handcrafted doc") {
    val row = Seq((1L, "Ab cd, EF!"))
      .toDF("doc_id", "text")
      .transform(TextOps.qualityFeatures(_, "text"))
      .collect()(0)
    assert(row.getAs[Int]("n_chars") == 10)
    assert(row.getAs[Int]("n_tokens") == 3)
    // punct: ',' '!' → 2/10; upper: A E F → 3/10; non-space chars 8 / 3 tokens
    assert(math.abs(row.getAs[Double]("punct_ratio") - 0.2) < 1e-12)
    assert(math.abs(row.getAs[Double]("upper_ratio") - 0.3) < 1e-12)
    assert(math.abs(row.getAs[Double]("mean_token_len") - 8.0 / 3) < 1e-12)
  }

  test("qualityFeatures on empty text yields zeros, not NaN") {
    val row = Seq((1L, ""))
      .toDF("doc_id", "text")
      .transform(TextOps.qualityFeatures(_, "text"))
      .collect()(0)
    assert(row.getAs[Double]("punct_ratio") == 0.0)
    assert(row.getAs[Double]("upper_ratio") == 0.0)
    assert(row.getAs[Double]("mean_token_len") == 0.0)
  }
}
