package graft

import org.apache.spark.sql.functions._

/** Pins the r21 kernel rewrites against the SQL formulations they
  * replaced, value-for-value on the driver fixture PLUS hostile rows
  * (NULL, empty, whitespace-only, every whitespace kind incl. the
  * vertical tab the 5-char class excludes, non-ASCII, repeated terms):
  * `term_freqs` vs the per-term HOF filter (q_bm25's tf columns) and
  * `gopher_counts` vs the regex/HOF gopher feature columns. The oracle
  * gate checks end-to-end outputs; this spec checks the kernels on
  * inputs the fixture never exercises. */
class KernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private val hostile = Seq(
    null.asInstanceOf[String], "", " ", " \t\n\f\r ", "",
    "ab", "the the the", "thé café ß", "a  b\tc\nd\fe\rf",
    "with-the", "the", "spark window merge spark", "x" * 500,
    "  leading and trailing  ")

  private def frame = {
    val fixture = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    (fixture ++ hostile).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("term_freqs equals the per-term HOF filter columns") {
    val terms = Seq("spark", "window", "merge", "the")
    val toks = split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
    val old = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"o$i")
    }
    val oldDl = graft.ops.TextOps.tokenCount(col("text")).cast("long").as("odl")
    val k = graft.functions.native.termFreqs(col("text"), terms)
    val rows = frame.select(
      Seq(col("id"), k.as("tfs"), oldDl) ++ old: _*).collect()
    rows.foreach { r =>
      val tfs = Option(r.getAs[scala.collection.Seq[Long]]("tfs"))
      if (r.isNullAt(r.fieldIndex("odl"))) {
        assert(tfs.isEmpty, s"row ${r.getLong(0)}: kernel must be NULL when old dl is NULL")
      } else {
        assert(tfs.get.head == r.getAs[Long]("odl"), s"dl row ${r.getLong(0)}")
        terms.indices.foreach { i =>
          assert(tfs.get(i + 1) == r.getAs[Long](s"o$i"),
            s"tf[$i] row ${r.getLong(0)}")
        }
      }
    }
  }

  test("gopher_counts equals the regex/HOF gopher feature columns") {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val t = col("text")
    val toks = split(trim(regexp_replace(t, "\\s+", " ")), " ")
    val oldNTok = graft.ops.TextOps.tokenCount(t).cast("long")
    val oldHits = size(array_intersect(
      array_distinct(toks), array(stop.map(lit): _*))).cast("long")
    val oldAlpha = size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("long")
    val oldWs = (length(t) - length(regexp_replace(t, "[ \\t\\n\\f\\r]", ""))).cast("long")
    val k = graft.functions.native.gopherCounts(t, stop)
    val rows = frame.select(col("id"), k.as("gc"),
      oldNTok.as("on"), oldAlpha.as("oa"), oldHits.as("oh"), oldWs.as("ow")).collect()
    rows.foreach { r =>
      val gc = Option(r.getAs[scala.collection.Seq[Long]]("gc"))
      if (r.isNullAt(r.fieldIndex("on"))) {
        assert(gc.isEmpty, s"row ${r.getLong(0)}: kernel must be NULL on NULL text")
      } else {
        assert(gc.get(0) == r.getAs[Long]("on"), s"n_tokens row ${r.getLong(0)}")
        assert(gc.get(1) == r.getAs[Long]("oa"), s"alpha row ${r.getLong(0)}")
        assert(gc.get(2) == r.getAs[Long]("oh"), s"hits row ${r.getLong(0)}")
        assert(gc.get(3) == r.getAs[Long]("ow"), s"ws row ${r.getLong(0)}")
      }
    }
  }

  test("gopher_counts dedupes a repeated stopword like array_intersect") {
    val k = graft.functions.native.gopherCounts(col("text"), Seq("the", "the", "be"))
    val row = Seq(("the the be x", 1L)).toDF("text", "id")
      .select(k.as("gc")).collect()(0)
    assert(row.getAs[scala.collection.Seq[Long]]("gc")(2) == 2L)
  }
}
