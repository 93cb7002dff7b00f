package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Relational, TextOps}

/** Trained char-n-gram NB language ID (q_langid_clf): closed-form
  * counting training, zero-shuffle reference-object scoring, and the
  * VERDICT-r12 contract — its macro-F1 beats the heuristic gate's on
  * the fixture. */
class LangIdClfSpec extends SparkTestBase {

  import spark.implicits._

  private def macroF1(report: DataFrame): Double = {
    val rows = report.collect()
    rows.map(r => if (r.isNullAt(6)) 0.0 else r.getDouble(6)).sum / rows.length
  }

  test("NB separates synthetic languages the stopword heuristic cannot, incl. held-out docs") {
    // two invented languages with disjoint character distributions;
    // docs 0-7 train (sampleSize 8), docs 10-11 are held out
    val aa = "kaka kiki kuku koko keke kaki kuko"
    val zz = "zuzu zizi zaza zozo zezu zazi zozu"
    val docs = ((0L to 7L).map(i => (i, if (i % 2 == 0) s"$aa $i" else s"$zz $i",
        if (i % 2 == 0) "aa" else "zz")) ++
      Seq((10L, "kiku kako keki", "aa"), (11L, "zazo zuzi zezo", "zz")))
      .toDF("doc_id", "text", "lang")
    val report = TextOps.langIdClassifier(docs, "doc_id", "text", "lang",
      sampleSize = 8, topK = 64, n = 3)
    val byClass = report.collect().map(r => r.getString(0) -> r).toMap
    // perfect separation on train AND held-out: support==tp for both
    assert(byClass("aa").getLong(1) == 5L && byClass("aa").getLong(3) == 5L)
    assert(byClass("zz").getLong(1) == 5L && byClass("zz").getLong(3) == 5L)
    assert(byClass.values.forall(_.getDouble(6) == 1.0))
  }

  test("fixture contract: trained NB macro-F1 beats the heuristic gate's") {
    val docs = Tables.documents(spark, sf001)
    val nb = macroF1(
      TextOps.langIdClassifier(docs, "doc_id", "text", "lang",
        sampleSize = 500, topK = 512, n = 3))
    val heur = macroF1(
      Relational.classificationReport(
        docs.select(col("lang"), TextOps.languageId(col("text")).as("p")),
        "lang", "p"))
    assert(nb > heur,
      s"trained NB macro-F1 $nb must beat the heuristic's $heur")
    assert(nb > 2 * heur,
      s"the win should be decisive on the fixture, got NB=$nb heur=$heur")
  }

  test("training is deterministic: retrain yields an identical report") {
    val docs = Tables.documents(spark, sf001)
    def once() = TextOps.langIdClassifier(docs, "doc_id", "text", "lang",
      sampleSize = 500, topK = 512, n = 3).collect().toSeq
    assert(once() == once())
  }

  test("report is partitioning-independent: the sample cut and vocab head are total orders") {
    val docs = Tables.documents(spark, sf001)
    def at(p: Int) = TextOps.langIdClassifier(docs.repartition(p),
      "doc_id", "text", "lang", sampleSize = 200, topK = 256, n = 3)
      .collect().toSeq
    val base = at(1)
    assert(at(4) == base && at(16) == base)
  }

  test("scoring is a zero-shuffle projection — the corpus never exchanges") {
    val pred = graft.functions.native.nbLangPredict(
      lower(col("text")), Seq("aa", "zz"), Seq(0.0, 0.0),
      Seq("kak", "zuz"), Seq(Seq(-1.0, -2.0), Seq(-2.0, -1.0)), 3)
    val plan = Seq((1L, "kakak")).toDF("doc_id", "text")
      .select(col("doc_id"), pred.as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("NULL text predicts NULL (excluded from the report), NULL lang never trains") {
    val docs = Seq(
      (0L, "kaka kiki kuku", "aa"),
      (1L, "zuzu zizi zaza", "zz"),
      (2L, null, "aa"),                 // NULL text: no prediction row
      (3L, "kaka kiki kuku", null))     // NULL lang: scores but no support
    .toDF("doc_id", "text", "lang")
    val report = TextOps.langIdClassifier(docs, "doc_id", "text", "lang",
      sampleSize = 10, topK = 64, n = 3)
    val rows = report.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the report's cells keep only (label, pred) BOTH non-null: id 2
    // contributes no prediction (NULL text) and id 3 no cell at all
    // (NULL label is dropped by the report even though it scores), so
    // each class supports and predicts exactly its one labeled doc
    assert(rows("aa") == ((1L, 1L)))
    assert(rows("zz") == ((1L, 1L)))
  }

  test("empty/unlabeled corpus yields an empty report, not a crash") {
    val docs = Seq((0L, "some text", null: String)).toDF("doc_id", "text", "lang")
    assert(TextOps.langIdClassifier(docs, "doc_id", "text", "lang").collect().isEmpty)
  }

  test("charNgrams indexes CODEPOINTS, not UTF-16 units — the DuckDB substr contract") {
    import org.apache.spark.unsafe.types.UTF8String
    // astral-plane chars are 2 UTF-16 units but 1 codepoint: the kernel
    // must produce the same grams DuckDB's character-counting substr
    // extracts, or the langid oracle diverges on emoji-bearing text
    val s = "a😀b" // a, 😀, b — 3 codepoints, 4 UTF-16 units
    val grams = graft.functions.TextKernels
      .charNgrams(UTF8String.fromString(s), 2)
    assert(grams.numElements() == 2)
    assert(grams.getUTF8String(0).toString == "a😀")
    assert(grams.getUTF8String(1).toString == "😀b")
  }
}
