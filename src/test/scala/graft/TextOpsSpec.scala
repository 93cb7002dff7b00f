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

  test("tokenCountBpe splits like a BPE pre-tokenizer") {
    val got = Seq("it's 42 well-known!", "", "   ", "hello world")
      .toDF("text")
      .select(TextOps.tokenCountBpe(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // "it","'s"," 42"," well","-","known","!" → 7; whitespace-only → 0
    assert(got == Seq(7, 0, 0, 2))
  }

  test("winnowFingerprints: identical content collides, shared passages overlap, unrelated don't") {
    val base = "the quick brown fox jumps over the lazy dog while the band plays on in the summer rain"
    val passage = s"unrelated preamble text here $base and some trailing content too"
    val other = "completely different words about catalyst optimizer internals and shuffle partitioning"
    val fps = Seq(base, base.replace("  ", " "), passage, other)
      .toDF("text")
      .select(TextOps.winnowFingerprints(col("text")).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0) == fps(1))                       // whitespace-normalized
    assert((fps(0) & fps(2)).size >= fps(0).size / 2) // shared passage ⇒ many shared fingerprints
    assert((fps(0) & fps(3)).isEmpty)              // unrelated ⇒ none
    assert(Seq("short").toDF("text")
      .select(TextOps.winnowFingerprints(col("text"), k = 8)).collect()(0).getSeq[Long](0).isEmpty)
  }

  test("curate applies quality gates then dedups among survivors only") {
    val df = Seq(
      // 0/1: duplicates (whitespace variants), both pass the gates → one survives
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick  brown fox jumps over the lazy dog"),
      // 2: too short (under minTokens)
      (2L, "too short"),
      // 3: punctuation-heavy → filtered by the ratio cap
      (3L, "spam!!! buy!!! now!!! spam!!! buy!!! now!!! spam!!! again!!!"),
      // 4: duplicate of 2 — its twin was FILTERED, not deduped, so this
      // doc is judged on its own quality and also fails the gate
      (4L, "too short"),
      // 5: clean singleton
      (5L, "a perfectly ordinary document with enough words to pass the gate")
    ).toDF("doc_id", "text")
    val got = TextOps
      .curate(df, "text", "doc_id", minTokens = 5L, maxTokens = 100L, maxPunctRatio = 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 5L))
    // equals the manual composition of its two stages
    val manual = TextOps.normalizedDedupIds(
      TextOps.qualityFeatures(df, "text")
        .filter(col("n_tokens").between(5, 100) && col("punct_ratio") <= 0.1),
      "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == manual)
  }

  test("exactDedup is idempotent") {
    val df = Seq((3L, "alpha"), (1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val once = TextOps.exactDedup(df, "text", "doc_id")
    val twice = TextOps.exactDedup(once, "text", "doc_id")
    assert(once.collect().toSet == twice.collect().toSet)
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


  test("languageId of NULL text is NULL, not a spurious label") {
    val got = Seq[Option[String]](None, Some("the cat and the dog is here"))
      .toDF("text")
      .select(TextOps.languageId(col("text")).as("lang"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getString(0) == "en")
  }

  test("qualityFeatures ratios are exact on a handcrafted doc") {
    val row = Seq((1L, "Ab cd, EF!"))
      .toDF("doc_id", "text")
      .transform(TextOps.qualityFeatures(_, "text"))
      .collect()(0)
    assert(row.getAs[Int]("n_chars") == 10)
    assert(row.getAs[Long]("n_tokens") == 3L)
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

  test("charClassCounts kernel: exact counts, Java-whitespace token runs (incl. \\v)") {
    import org.apache.spark.unsafe.types.UTF8String
    def cc(t: String): Seq[Long] = {
      val a = graft.functions.TextKernels.charClassCounts(UTF8String.fromString(t))
      (0 until 4).map(a.getLong(_))
    }
    assert(cc("") == Seq(0L, 0L, 0L, 0L))
    assert(cc("Ab cd, EF!") == Seq(2L, 3L, 2L, 3L)) // punct , ! ; upper A E F; 2 spaces; 3 tokens
    // class 2 counts ALL RE2-\\s whitespace (r20: mean_token_len must
    // subtract newlines/tabs like spaces, or token length inflates on
    // newline-separated docs)
    assert(cc("a\nb\tc\rd\fe") == Seq(0L, 0L, 4L, 5L))
    // \u000b is whitespace to Java regex \\s (a token SPLITTER to this
    // kernel) but NOT in RE2 \\s — so it stays uncounted in class 2 on
    // both engines (the SQL oracles mirror the RE2 set exactly)
    assert(cc("a\u000bb") == Seq(0L, 0L, 0L, 2L))
    // UTF-8 continuation bytes never collide with the ASCII classes
    assert(cc("\u00e9. A") == Seq(1L, 1L, 1L, 2L))
  }

  test("langScores kernel: word-boundary semantics match the regex formulation") {
    import org.apache.spark.unsafe.types.UTF8String
    def ls(t: String): Seq[Long] = {
      val a = graft.functions.TextKernels.langScores(UTF8String.fromString(t))
      (0 until 5).map(a.getLong(_))
    }
    assert(ls("") == Seq(0L, 0L, 0L, 0L, 0L))
    // a word inside a longer \\w-run is NOT a match ("theory", "to_do");
    // punctuation-adjacent and case variants ARE ("la"+"est"+"est" → fr 3)
    assert(ls("THE theory to_do the, la-est est") == Seq(0L, 2L, 0L, 3L, 0L))
    // one word can score for several languages ("es" list holds "en"/"es")
    assert(ls("en es") == Seq(0L, 0L, 0L, 0L, 2L))
    assert(ls("\u4e2d\u6587 the") == Seq(2L, 1L, 0L, 0L, 0L))
  }

  test("md5Long matches the documented first-8-bytes-of-MD5 contract") {
    import org.apache.spark.unsafe.types.UTF8String
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(graft.functions.TextKernels.md5Long(UTF8String.fromString("abc")) ==
      java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16))
  }

  test("repetition: duplicate-window fraction, short-doc NULL, exact arithmetic") {
    val docs = Seq(
      (0L, "a b c a b c"),        // windows 4 ("a b c","b c a","c a b","a b c"), distinct 3 -> 0.25
      (1L, "a b c d e"),          // windows 3, all distinct -> 0.0
      (2L, "x x x x x"),          // windows 3, distinct 1 -> 2/3
      (3L, "one two"),            // too short: 0 windows -> NULL ratio
      (4L, "   "),                // whitespace-only: 0 windows -> NULL
      (5L, "a b c")               // exactly one window -> 0.0
    ).toDF("doc_id", "text")
    val got = TextOps.repetition(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(0L) == ((4L, 3L, Some(0.25))))
    assert(got(1L) == ((3L, 3L, Some(0.0))))
    assert(got(2L) == ((3L, 1L, Some(2.0 / 3))))
    assert(got(3L) == ((0L, 0L, None)))
    assert(got(4L)._3.isEmpty)
    assert(got(5L) == ((1L, 1L, Some(0.0))))
    // pure projection: no exchange except the oracle-determinism sort
    val plan = TextOps.repetition(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("decontaminate drops exactly the n-gram-overlapping training docs") {
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today")).toDF("doc_id", "text")
    val train = Seq(
      // contains the eval 8-gram "quick brown fox jumps over the lazy dog"
      (1L, "prefix words quick brown fox jumps over the lazy dog and more"),
      // shares 7-gram runs only — survives at n=8
      (2L, "quick brown fox jumps over the lazy cat entirely different ending"),
      (3L, "completely unrelated text with eight or more words in it"),
      (4L, "short doc")).toDF("doc_id", "text")
    val got = TextOps.decontaminate(train, evalDocs, "doc_id", "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L, 4L))
  }

  test("decontaminate broadcasts the eval grams — training side never shuffles for the probe") {
    val docs = Tables.documents(spark, sf001)
    val plan = TextOps
      .decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("deterministicSample is reproducible, rate-monotone, and exact at the endpoints") {
    val docs = Tables.documents(spark, sf001)
    def ids(rates: Map[String, Double], default: Double): Seq[Long] =
      TextOps.deterministicSample(docs, "doc_id", "lang", rates, default)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val all = docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(Map.empty, 1.0) == all)                    // rate 1.0 keeps everything
    assert(ids(Map.empty, 0.0).isEmpty)                   // rate 0.0 keeps nothing
    val half = ids(Map.empty, 0.5)
    assert(half == ids(Map.empty, 0.5))                   // same verdicts on re-run
    assert(half.toSet.subsetOf(ids(Map.empty, 0.8).toSet)) // nested samples: higher rate ⊇ lower
    val enOnly = ids(Map("en" -> 0.0), 1.0).toSet
    val langs = docs.select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enOnly == langs.collect { case (id, l) if l != "en" => id }.toSet)
  }

  test("chunk: overlapping windows, emitted tail, empty docs dropped") {
    val docs = Seq(
      (0L, "a b c d e f g"),  // 7 toks, window 4 stride 3: [a b c d],[d e f g],[g]
      (1L, "x y"),            // shorter than window: one short chunk
      (2L, "   "),            // whitespace-only: no chunks
      (3L, "")                // empty: no chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunk(docs, "doc_id", "text", window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (0L, 0, "a b c d", 4), (0L, 1, "d e f g", 4), (0L, 2, "g", 1),
      (1L, 0, "x y", 2)))
    // pure per-row explode: no exchange in the plan
    val plan = TextOps.chunk(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("paragraphDedup: repeats survive only at first occurrence, docs rebuilt") {
    val docs = Seq(
      (0L, "a b c d e f"),          // both tiles canonical
      (1L, "a b c x y z"),          // tile 0 repeats doc 0's → cut
      (2L, "d e f d e f"),          // every tile a repeat → empty text
      (3L, "p q r p q r p q r"),    // intra-doc repeats: first kept
      (4L, "   "),                  // no tiles: passes through verbatim
      (5L, "u  v   w"),             // unique, irregular whitespace: verbatim
      (6L, "a b c tail")            // cut tile + short tail tile
    ).toDF("doc_id", "text")
    val got = TextOps.paragraphDedup(docs, "doc_id", "text", tileWords = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, "a b c d e f", 0L, 2L),
      (1L, "x y z", 1L, 2L),
      (2L, "", 2L, 2L),
      (3L, "p q r", 2L, 3L),
      (4L, "   ", 0L, 0L),
      (5L, "u  v   w", 0L, 1L),
      (6L, "tail", 1L, 2L)))
    // skew posture: canonical occurrence via partially-aggregable
    // min/count, NOT a window rank — a boilerplate tile shared by half
    // the corpus must combine map-side, not funnel one task
    val plan = TextOps.paragraphDedup(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"), plan)
  }

  test("qualityClassifier: NB gate separates classes, handles unseen buckets, zero-shuffle scoring") {
    // sample docs: ids 0-5 train the model (first-6-by-id), id 10 scores
    // with an out-of-sample bucket (longer text than any training doc)
    val good = ("the " + "sensible words and that have with " * 12).trim // passes gopher bands
    val bad = "zz!! ##" // fails everything
    val docs = (0L to 5L).map(i => (i, if (i % 2 == 0) good else bad)) :+
      (10L, ("the " + "plausible tokens that have with and " * 40).trim)
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.qualityClassifier(df, "doc_id", "text", sampleSize = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val byId = got.map(g => g._1 -> g).toMap
    // gopher-passing docs score positive, failing docs negative
    assert(byId(0L)._3 && byId(2L)._3 && byId(4L)._3)
    assert(!byId(1L)._3 && !byId(3L)._3 && !byId(5L)._3)
    assert(byId(0L)._2 > byId(1L)._2)
    // out-of-sample doc with an unseen f_len bucket still scores (the
    // smoothed unseen weight, not a crash or NULL)
    assert(!byId(10L)._2.isNaN)
    // pass verdict reads the ROUNDED score
    got.foreach { case (_, s, p) => assert(p == (s >= 0)) }
    // deterministic: retrain on the same data → identical scores
    val again = TextOps.qualityClassifier(df, "doc_id", "text", sampleSize = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == again.toSeq)
    // scoring is one projection: no Exchange before the output sort
    val plan = TextOps.qualityClassifier(df, "doc_id", "text", sampleSize = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("vocab: frequency order with deterministic token tie-break") {
    val docs = Seq((1L, "b a a c b a"), (2L, "c d")).toDF("doc_id", "text")
    val got = TextOps.vocab(docs, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 2L))) // b before c? no — counts 3,2,2; tie b<c
    val plan = TextOps.vocab(docs, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan) // no global sort
  }

  test("deterministicSample drops NULL-stratum rows (SQL || semantics)") {
    val df = Seq((1L, "en"), (2L, null.asInstanceOf[String])).toDF("doc_id", "lang")
    val got = TextOps.deterministicSample(df, "doc_id", "lang", Map.empty, 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("ngramCounts: sliding windows, short/empty docs excluded, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b c a b"), // bigrams: a b, b c, c a, a b
      (2L, "a"),         // shorter than n: nothing
      (3L, "   "),       // whitespace-only: nothing
      (4L, "c a")        // one window
    ).toDF("doc_id", "text")
    val got = TextOps.ngramCounts(docs, "text", n = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b", 2L), ("c a", 2L), ("b c", 1L)))
    // top-k truncates after the deterministic order
    val top1 = TextOps.ngramCounts(docs, "text", 2, 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("a b"))
    // n=1 degenerates to vocab
    val uni = TextOps.ngramCounts(docs, "text", 1, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val voc = TextOps.vocab(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(uni == voc)
    // same top-k shape as vocab: no global sort
    val plan = TextOps.ngramCounts(docs, "text", 2, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pack: per-shard running offsets, straddling docs, empty docs dropped") {
    val docs = Seq(
      (0L, "a b c"),     // shard 0: off 0 → seq 0 @ 0
      (2L, "d e f g"),   // shard 0: off 3 → seq 0 @ 3
      (4L, "h i"),       // shard 0: off 7 → seq 1 @ 2  (budget 5: straddle at 5)
      (1L, "x"),         // shard 1: off 0 → seq 0 @ 0
      (3L, "   "),       // shard 1: empty — dropped
      (5L, "y z w v u t")// shard 1: off 1 → seq 0 @ 1
    ).toDF("doc_id", "text")
    val got = TextOps.pack(docs, "doc_id", "text", budget = 5, shards = 2)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (0, 0L, 3L, 0L, 0), (0, 2L, 4L, 0L, 3), (0, 4L, 2L, 1L, 2),
      (1, 1L, 1L, 0L, 0), (1, 5L, 6L, 0L, 1)))
    // offsets are a per-shard prefix sum: each doc starts where the
    // previous ended (seq_ix*budget + seq_off is cumulative)
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).foldLeft(0L) { case (expectOff, (_, _, n, six, soff)) =>
        assert(six * 5L + soff == expectOff)
        expectOff + n
      }
    }
  }

  test("assignSplit: total partition, reproducible, NULL id unassigned, fractions validated") {
    val docs = (0L to 499L).map(i => Tuple1(i)).toDF("doc_id")
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val got = TextOps.assignSplit(docs, "doc_id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row lands in exactly one split
    assert(got.values.sum == 500L)
    assert(got.keySet == Set("train", "val", "test"))
    // roughly proportional (md5 is uniform; 500 rows, generous bounds)
    assert(got("train") > 300L && got("train") < 450L)
    // reproducible across invocations and partitionings
    val again = TextOps.assignSplit(docs.repartition(7), "doc_id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
    // NULL id → NULL split
    val nul = TextOps.assignSplit(
      Seq(Tuple1(Option.empty[Long])).toDF("doc_id"), "doc_id", splits)
      .select("split").collect().head
    assert(nul.isNullAt(0))
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      TextOps.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("corpusReport: totals, cardinalities, exact duplicate fraction") {
    val docs = Seq(
      ("dup text", "en", "s1"),
      ("dup text", "en", "s2"), // exact duplicate
      ("other", "de", "s1"),
      ("third one here", "en", "s1")
    ).toDF("text", "lang", "source")
    val r = TextOps.corpusReport(docs, "text", "lang", "source").collect()(0)
    assert(r.getLong(0) == 4L)        // n_docs
    assert(r.getLong(1) == 2 + 2 + 1 + 3) // n_tokens
    assert(r.getLong(2) == 2L)        // n_langs
    assert(r.getLong(3) == 2L)        // n_sources
    assert(r.getDouble(4) == 1.0 - 3.0 / 4.0) // dup_fraction
  }

  test("dedupAgainst keeps only incoming docs absent from history (normalized)") {
    val history = Seq((1L, "seen before"), (2L, "also  seen")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "seen before"),   // exact dup — dropped
      (11L, "also seen"),     // whitespace-normalized dup — dropped
      (12L, "brand new")      // survives
    ).toDF("doc_id", "text")
    val got = TextOps.dedupAgainst(history, incoming, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(12L))
    // schema unchanged, no helper columns leak
    assert(TextOps.dedupAgainst(history, incoming, "text").columns.toSeq
      == Seq("doc_id", "text"))
  }

  test("dedupAgainstBloom equals the exact anti-join at any filter sizing, incl. saturated") {
    val history = Seq((1L, "seen before"), (2L, "also  seen"), (3L, "third doc"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "seen before"),        // exact dup — dropped
      (11L, "also seen"),          // normalized dup — dropped
      (12L, "brand new"),          // survives on the bloom-clean branch
      (13L, null.asInstanceOf[String]), // NULL text: kept (null join key)
      (14L, "another fresh one")
    ).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    val exact = ids(TextOps.dedupAgainst(history, incoming, "text"))
    // well-sized filter
    assert(ids(TextOps.dedupAgainstBloom(history, incoming, "text",
      expectedItems = 1024, fpp = 0.01)) == exact)
    // deliberately SATURATED filter (1 expected item, 40% fpp): every
    // probe may come back positive — the exact verify still yields the
    // same survivors, the answer never depends on the sizing
    assert(ids(TextOps.dedupAgainstBloom(history, incoming, "text",
      expectedItems = 1, fpp = 0.4)) == exact)
    // schema unchanged
    assert(TextOps.dedupAgainstBloom(history, incoming, "text").columns.toSeq
      == Seq("doc_id", "text"))
  }

  test("bloom put/probe convention round-trips: every inserted fingerprint probes true") {
    // the no-false-negative guarantee is only real if build and kernel
    // agree on bytes — pin it by probing every inserted value
    val docs = Seq.tabulate(500)(i => (i.toLong, s"document number $i body"))
      .toDF("doc_id", "text")
    val fp = md5(trim(regexp_replace(col("text"), "\\s+", " ")))
    val bytes = TextOps.buildBloomBytes(
      docs.select(fp.as("f")), col("f"), expectedItems = 1024, fpp = 0.01)
    val misses = docs
      .select(graft.functions.native.bloomMightContain(fp, bytes).as("hit"))
      .filter(!col("hit"))
      .count()
    assert(misses == 0L, "a false NEGATIVE would silently resurrect duplicates")
  }

  test("qualityClassifier survives NULL text in the sample window; NULL-text docs emit no row") {
    // doc 0 is NULL text and sits INSIDE the first-10-by-id sample —
    // before the guard this NPE'd on the null Gopher verdict
    val docs = Seq((0L, null.asInstanceOf[String])) ++
      (1L to 40L).map(i => (i, s"doc number $i with the usual words " * 8))
    val out = TextOps.qualityClassifier(
      docs.toDF("doc_id", "text"), "doc_id", "text", sampleSize = 10)
    val ids = out.collect().map(_.getLong(0)).toSet
    assert(ids == (1L to 40L).toSet, "null-text doc excluded, all others scored")
  }

  test("paragraphDedup: NULL-text docs carry zero counters, not NULLs") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextOps.paragraphDedup(df, "doc_id", "text", tileWords = 2)
      .filter(col("doc_id") === 2L).collect()(0)
    assert(r.isNullAt(1), "NULL text passes through as NULL")
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
      "removed/total tiles must both be 0, not NULL")
  }

  test("weightedSample: exact size per stratum, driver-model equality, weight mass wins") {
    val rows = (1L to 40L).map(i => (i, if (i <= 25) "a" else "b",
      if (i == 3L) 1.0e9 else 1.0 + (i % 5))) ++
      Seq((41L, "a", 0.0), (42L, "a", -3.0), (43L, "a", Double.NaN),
        (44L, null.asInstanceOf[String], 5.0))
    val df = rows.toDF("doc_id", "strata", "w")
    val out = TextOps.weightedSample(df, "doc_id", "strata", col("w"), n = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // driver model with the operator's exact arithmetic
    def key(strata: String, id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$strata:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u32 = java.lang.Long.parseLong(hex, 16).toDouble
      val u = (u32 + 0.5) / 4294967296.0
      BigDecimal(math.log(w) - math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val eligible = rows.filter { case (_, s, w) => s != null && w > 0 && !w.isNaN }
    val expect = eligible.groupBy(_._2).flatMap { case (s, rs) =>
      rs.map { case (id, _, w) => (id, key(s, id, w)) }
        .sortBy { case (id, k) => (-k, id) }.take(5).map(t => (t._1, s))
    }.toSet
    assert(out == expect)
    // exactly n per stratum (both strata have > 5 eligible rows)
    assert(out.count(_._2 == "a") == 5 && out.count(_._2 == "b") == 5)
    // the 1e9-weight doc has overwhelming mass — the model (and the
    // operator) must have kept it
    assert(out.contains((3L, "a")))
    // partitioning-independent
    val repart = TextOps
      .weightedSample(df.repartition(13), "doc_id", "strata", col("w"), n = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(repart == out)
    // n >= stratum size keeps every eligible row
    val all = TextOps.weightedSample(df, "doc_id", "strata", col("w"), n = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(all == eligible.map(_._1).toSet)
  }

  test("bigramLmScore matches a driver model; scrambled word order screams where unigram is blind") {
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "the dog sat on the mat",
      4L -> "mat the on sat cat the", // same BAG of words as doc 1
      5L -> "")
    val docs = texts.toDF("doc_id", "text")
    val lambda = 0.75
    val out = TextOps
      .bigramLmScore(docs, "doc_id", "text", maxVocab = 100, maxBigrams = 100, lambda = lambda)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // driver model with the operator's exact arithmetic
    val tokenized = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val cu = tokenized.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cb = tokenized.flatMap { case (_, ts) => ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (totalU, vU, vB) = (cu.values.sum.toDouble, cu.size.toDouble, cb.size.toDouble)
    def pu(w: String) = (cu.getOrElse(w, 0L) + 1.0) / ((totalU + vU) + 1.0)
    def nll(ts: Seq[String]): Double =
      if (ts.isEmpty) 0.0
      else {
        var acc = -math.log(pu(ts.head))
        ts.sliding(2).filter(_.size == 2).foreach { case Seq(p, w) =>
          val pb = (cb.getOrElse(s"$p $w", 0L) + 1.0) / ((cu.getOrElse(p, 0L).toDouble + vB) + 1.0)
          acc += -math.log(lambda * pb + (1.0 - lambda) * pu(w))
        }
        acc
      }
    tokenized.foreach { case (id, ts) =>
      if (ts.isEmpty) assert(out(id).isEmpty)
      else assert(out(id).contains(nll(ts) / ts.size),
        s"doc $id: ${out(id)} vs model ${nll(ts) / ts.size}")
    }
    // the selling point: identical word BAG, scrambled ORDER — unigram
    // NLL is identical by construction, the bigram gate separates them
    val uniLm = TextOps.trainUnigramLm(docs, "text", 100)
    val uniNll = docs
      .select(col("doc_id"), uniLm.avgNll(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(uniNll(1L) == uniNll(4L), "unigram is order-blind by construction")
    assert(out(4L).get > out(1L).get + 0.3,
      s"scrambled doc must score clearly worse: ${out(4L)} vs ${out(1L)}")
  }

  test("charEntropyScores matches hand-computed entropies; empty/NULL docs emit no row") {
    val df = Seq(
      (1L, "aab"),                       // 2/3·ln(3/2) + 1/3·ln(3)
      (2L, "abab"),                      // ln 2
      (3L, "aaaa"),                      // zero diversity
      (4L, ""),                          // no distribution -> no row
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.charEntropyScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      1L -> r6(2.0 / 3 * math.log(3.0 / 2) + 1.0 / 3 * math.log(3.0)),
      2L -> r6(math.log(2.0)),
      3L -> 0.0))
    // pure projection: no exchange at any corpus size
    val plan = TextOps.charEntropyScores(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("dedupAgainstBloom: empty history keeps every incoming row") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incoming = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextOps.dedupAgainstBloom(history, incoming, "text",
      expectedItems = 8, fpp = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 2L))
  }

  test("rareTerms: rarest-first by document frequency, per-doc dedup, deterministic ties") {
    val docs = Seq(
      (1L, "common rare1 common common"), // df: common=3, rare1=1
      (2L, "common rare2"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val got = TextOps.rareTerms(docs, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // in-doc repeats count once (df is DOCUMENT frequency)
    assert(got == Seq(
      (1L, 1, "rare1", 1L), (1L, 2, "common", 3L),
      (2L, 1, "rare2", 1L), (2L, 2, "common", 3L),
      (3L, 1, "common", 3L)))
  }

  test("sourceMix: per-source docs/tokens, shares are exact fractions of the total") {
    val docs = Seq(
      ("s1", "a b  c"), ("s1", "d"), ("s2", "e f"), ("s2", "   ")
    ).toDF("source", "text")
    val got = TextOps.sourceMix(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(("s1", 2L, 4L, 4.0 / 6.0), ("s2", 2L, 2L, 2.0 / 6.0)))
    assert(got.map(_._4).sum == 1.0)
  }

  test("unigramLmScore matches a driver-side Laplace model and flags atypical vocab") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "zxqv wkjh qpzm vbnx glrt"), // all-rare vocab -> highest ppl
      (4L, "the the the the"),          // all-common vocab -> lowest ppl
      (5L, "   ")                       // no tokens -> NULL score
    )
    val got = graft.ops.TextOps.unigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    // driver-side model with the operator's exact arithmetic order
    val counts = docs.flatMap(_._2.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    val vsize = counts.size.toDouble
    for ((id, text) <- docs) {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) {
        assert(got(id).isNullAt(2) && got(id).isNullAt(3) && got(id).getLong(1) == 0L)
      } else {
        val nll = toks.foldLeft(0.0)((acc, t) =>
          acc - math.log((counts.getOrElse(t, 0L).toDouble + 1.0) / (total + vsize + 1.0)))
        assert(got(id).getLong(1) == toks.length.toLong)
        assert(math.abs(got(id).getDouble(2) - nll / toks.length) <= 1e-12)
        // ppl is emitted rounded to 6 decimals (engine-portable exp)
        assert(math.abs(got(id).getDouble(3) - math.exp(nll / toks.length)) <= 5e-7)
      }
    }
    assert(got(3L).getDouble(3) > got(1L).getDouble(3), "rare vocab must score higher ppl")
    assert(got(4L).getDouble(3) < got(1L).getDouble(3), "common vocab must score lower ppl")
  }

  test("unigramLmScore vocab cap pushes tail terms into the OOV mass deterministically") {
    val docs = Seq((1L, "a a a b b c"), (2L, "c d")).toDF("doc_id", "text")
    // maxVocab=2 keeps {a:3, b:2}; c and d become OOV (count 0)
    val got = graft.ops.TextOps.unigramLmScore(docs, "doc_id", "text", maxVocab = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val total = 5.0 // kept vocab mass: a=3, b=2
    val vsize = 2.0
    def nllOf(ts: Seq[Long]) =
      ts.foldLeft(0.0)((acc, c) => acc - math.log((c + 1.0) / (total + vsize + 1.0)))
    assert(math.abs(got(1L) - nllOf(Seq(3, 3, 3, 2, 2, 0)) / 6) <= 1e-12)
    assert(math.abs(got(2L) - nllOf(Seq(0, 0)) / 2) <= 1e-12)
  }

  test("redact scrubs emails, IPs, and phones with typed placeholders and per-rule counts") {
    val docs = Seq(
      (1L, "mail alice.smith+spam@example.org or bob@sub.example.co today"),
      (2L, "server at 10.0.255.3 fell over; backup is 192.168.1.17"),
      (3L, "call +1 (555) 123-4567 or 555-987-6543 now"),
      (4L, "nothing sensitive here"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.redact(docs, "text")
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "text_redacted")
      .collect().map(r => (r.getLong(0), r)).toMap
    assert(got(1L).getString(4) == "mail <EMAIL> or <EMAIL> today")
    assert(got(1L).getInt(1) == 2 && got(1L).getInt(3) == 0)
    assert(got(2L).getString(4) == "server at <IP> fell over; backup is <IP>")
    assert(got(2L).getInt(2) == 2)
    assert(got(3L).getString(4) == "call <PHONE> or <PHONE> now")
    assert(got(3L).getInt(3) == 2)
    assert(got(4L).getString(4) == "nothing sensitive here")
    assert((1 to 3).forall(i => got(4L).getInt(i) == 0))
    assert(got(5L).isNullAt(4) && got(5L).isNullAt(1))
  }

  test("redact rules apply serially: an email's digit run is not double-counted as a phone") {
    val docs = Seq((1L, "reach bob123456789@example.com")).toDF("doc_id", "text")
    val r = TextOps.redact(docs, "text").select("n_email", "n_phone", "text_redacted").head()
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 0) // serial: the digits were consumed by <EMAIL>
    assert(r.getString(2) == "reach <EMAIL>")
  }

  test("redact serial-id rule collapses entity serial numbers") {
    val docs = Seq((1L, "Customer#000000042"), (2L, "Supplier#000000007 and Customer#000000042"))
      .toDF("doc_id", "text")
    val got = TextOps.redact(docs, "text", Seq(TextOps.serialIdRule))
      .select("doc_id", "n_serial_id", "text_redacted")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    assert(got(1L) == ((1, "Customer#<ID>")))
    assert(got(2L) == ((2, "Supplier#<ID> and Customer#<ID>")))
  }

  test("sourceCap: per-stratum quota, hash-order winners, partitioning-independent") {
    val docs = Tables.documents(spark, sf001)
    val cap3 = TextOps.sourceCap(docs, "doc_id", "source", cap = 3)
    val perSrc = cap3.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(perSrc.nonEmpty && perSrc.forall(_._2 <= 3), perSrc.toSeq)
    val ids3 = cap3.select("doc_id").collect().map(_.getLong(0)).toSet
    // same verdict under a different physical partitioning
    val ids3b = TextOps.sourceCap(docs.repartition(7), "doc_id", "source", cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3 == ids3b)
    // the hash order IS the reservoir: growing the cap only adds winners
    val ids5 = TextOps.sourceCap(docs, "doc_id", "source", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3.subsetOf(ids5))
    // survivors keep their full row (semi-join, not a projection)
    assert(cap3.columns.toSeq == docs.columns.toSeq)
    intercept[IllegalArgumentException](TextOps.sourceCap(docs, "doc_id", "source", cap = 0))
  }

  test("sourceCap drops NULL-stratum rows (the deterministicSample convention)") {
    import org.apache.spark.sql.functions.{col, when}
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "src")
      .withColumn("src", when(col("doc_id") =!= 3L, col("src")))
    val got = TextOps.sourceCap(df, "doc_id", "src", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("gopherQuality: stopword hits are DISTINCT, alpha fraction exact, bands composite") {
    val long = ("the quick brown fox " * 20).trim // 80 tokens, all alpha, 'the' repeated
    val docs = Seq(
      (1L, long + " and of"),             // 82 tokens, 3 distinct hits — passes
      (2L, long),                          // only 'the' — fails minStopwordHits
      (3L, "the and " + ("12 34 56 78 " * 20).trim), // digits — fails alpha fraction
      (4L, "the and short text"),          // 4 tokens — fails token band
      (5L, ""))                            // empty — zeros, fails
      .toDF("doc_id", "text")
    val got = TextOps.gopherQuality(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got(1L)._1 == 82L && got(1L)._2 == 3L && got(1L)._3 == 1.0 && got(1L)._4)
    assert(got(2L)._2 == 1L && !got(2L)._4)       // repeats of 'the' count once
    assert(got(3L)._3 < 0.8 && !got(3L)._4)
    assert(got(4L)._1 == 4L && !got(4L)._4)
    assert(got(5L) == ((0L, 0L, 0.0, false)))
    // pure projection: no exchange except the determinism sort
    val p = TextOps.gopherQuality(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("gopherQuality: mean token length subtracts ALL whitespace, not just spaces (r20)") {
    // newline-separated 5-char words: a space-only subtraction counted
    // each '\n' as token length (mean 6.0) and pushed long-word docs
    // past the maxMeanTokenLen band that should pass
    val nl = (1 to 60).map(_ => "abcde").mkString("\n")
    val sp = (1 to 60).map(_ => "abcde").mkString(" ")
    val got = TextOps.gopherQuality(
      Seq((1L, "the and " + nl), (2L, "the and " + sp)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got(2L),
      s"newline- and space-separated docs must measure the same: $got")
    // 62 tokens: the+and (3+3 chars) + 60×5 — mean = 306/62
    assert(math.abs(got(1L) - 306.0 / 62.0) < 1e-12, got(1L).toString)
  }

  test("mixRebalance: rates downsample to target shares, never upsample, default to 1.0") {
    // tokens: a=6, b=3, c=1 → shares 0.6, 0.3, 0.1
    val docs = Seq(
      (1L, "a", "w w w w w w"),
      (2L, "b", "w w w"),
      (3L, "c", "w"))
      .toDF("doc_id", "src", "text")
    val got = TextOps.mixRebalance(docs, "src", "text", Map("a" -> 0.3, "c" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("a") == 0.3 / 0.6)  // over target → downsampled
    assert(got("b") == 1.0)        // no target → keep all
    assert(got("c") == 1.0)        // under target → rates never upsample
    // rates feed deterministicSample: expected kept tokens for 'a'
    // land at its target share of the ORIGINAL total (0.3 of 10 = 3)
    assert(math.abs(got("a") * 6 - 3.0) < 1e-12)
    intercept[IllegalArgumentException](
      TextOps.mixRebalance(docs, "src", "text", Map.empty))
    intercept[IllegalArgumentException](
      TextOps.mixRebalance(docs, "src", "text", Map("a" -> 1.5)))
  }

  test("corpusDiff: added/removed/changed by normalized fingerprint, unchanged dropped") {
    val old = Seq(
      (1L, "same text"),
      (2L, "old version"),
      (3L, "whitespace   run"), // normalizes equal to the new side
      (4L, "will be removed"))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same text"),       // unchanged — dropped
      (2L, "new version"),     // changed
      (3L, "whitespace run"),  // normalized-equal — dropped
      (5L, "brand new doc"))   // added
      .toDF("doc_id", "text")
    val got = TextOps.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (4L, "removed"), (5L, "added")))
    // both sides reduce to (id, fingerprint) projections before the
    // join: every exchange is keyed by doc_id, never the text
    val p = TextOps.corpusDiff(old, neu, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(_.contains("doc_id")), p)
  }

  test("corpusDiff: NULL text is a value — presence is by side, not fingerprint nullness") {
    val old = Seq((1L, None), (2L, None), (3L, Option("text")), (4L, None))
      .toDF("doc_id", "text")
    val neu = Seq((1L, None), (2L, Option("now set")), (3L, None))
      .toDF("doc_id", "text")
    val got = TextOps.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1: NULL==NULL unchanged (dropped); 2: NULL→text changed;
    // 3: text→NULL changed; 4: only-old removed (even with NULL text)
    assert(got == Seq((2L, "changed"), (3L, "changed"), (4L, "removed")))
  }

  test("dsirWeights matches the two-model Laplace algebra and separates the target slice") {
    // target model on the 't' slice: {a:3}, total 3, V=1; raw model on
    // all docs: {a:3, b:3}, total 6, V=2 — hand arithmetic
    val docs = Seq((1L, "a a a", "t"), (2L, "b b b", "r"), (3L, "", "r"))
      .toDF("doc_id", "text", "slice")
    val got = graft.ops.TextOps.dsirWeights(
        docs, "doc_id", "text", org.apache.spark.sql.functions.col("slice") === "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    def nll(c: Long, total: Double, v: Double) = -math.log((c + 1.0) / (total + v + 1.0))
    val wa = 3.0 * nll(3, 6, 2) - 3.0 * nll(3, 3, 1) // a: raw − target
    val wb = 3.0 * nll(3, 6, 2) - 3.0 * nll(0, 3, 1) // b: OOV under target
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - wa) < 1e-12 && got(1L)._3)
    assert(got(2L)._1 == 3L && math.abs(got(2L)._2 - wb) < 1e-12 && !got(2L)._3)
    // empty doc: the empty fold weighs exactly 0.0 and passes at tau = 0
    assert(got(3L) == ((0L, 0.0, true)))
    // NULL text folds like the empty doc (the oracle's coalesce convention)
    val withNull = docs.unionByName(
      Seq((4L, Option.empty[String], "r")).toDF("doc_id", "text", "slice"))
    val nullRow = graft.ops.TextOps.dsirWeights(
        withNull, "doc_id", "text", org.apache.spark.sql.functions.col("slice") === "t")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 4L).head()
    assert(nullRow.isNullAt(1) && nullRow.getDouble(2) == 0.0 && nullRow.getBoolean(3))
    // target-resembling docs outscore the rest on the fixture
    val fix = graft.ops.TextOps.dsirWeights(
        Tables.documents(spark, sf001), "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .join(Tables.documents(spark, sf001), "doc_id")
      .select("lang", "weight").collect().map(r => r.getString(0) -> r.getDouble(1))
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val (en, rest) = fix.partition(_._1 == "en")
    assert(mean(en.map(_._2)) > mean(rest.map(_._2)))
  }

  test("dsirWeights scoring is a zero-shuffle projection — the corpus never exchanges") {
    val docs = Tables.documents(spark, sf001)
    val p = graft.ops.TextOps.dsirWeights(
        docs, "doc_id", "text", org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    // the only allowed exchange is the oracle-determinism output sort's
    // range partitioning; no hash exchange touches the corpus
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("collocations ranks high-PMI pairs first, floors rare pairs, matches the model") {
    // "aa bb" co-occurs always (high PMI); "cc dd" co-occur but cc/dd
    // also appear apart (lower PMI); "ee ff" occurs once (< minCount)
    val doc = ("aa bb " * 6) + ("cc dd " * 5) + ("cc xx dd yy " * 5) + "ee ff"
    val docs = Seq((1L, doc.trim)).toDF("doc_id", "text")
    val got = graft.ops.TextOps.collocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val tokens = doc.trim.split("\\s+")
    val nUni = tokens.length.toDouble
    val nBi = (tokens.length - 1).toDouble
    def model(cab: Long, ca: Long, cb: Long): Double = {
      val raw = math.log((cab / nBi) / ((ca / nUni) * (cb / nUni)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byPair = got.map(t => (t._1, t._2) -> t).toMap
    // aa->bb: cab=6, ca=cb=6
    assert(byPair(("aa", "bb"))._6 == model(6, 6, 6))
    // cc->dd: adjacent only in the "cc dd" block
    assert(byPair(("cc", "dd"))._6 == model(5, 10, 10))
    assert(!byPair.contains(("ee", "ff")), "hapax pair must be floored out")
    // the always-together pair must outrank the sometimes-apart pair
    assert(got.head._1 == "aa" && byPair(("aa", "bb"))._6 > byPair(("cc", "dd"))._6)
  }

  test("collocations plan: broadcast pair joins + TakeOrdered, no corpus re-shuffle") {
    val docs = Tables.documents(spark, sf001)
    val plan = graft.ops.TextOps.collocations(docs, "text")
      .queryExecution.executedPlan.toString
    // both unigram joins broadcast (vocab-sized build sides) and the
    // top-k is per-partition heads + k-row merge, not a global sort
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("tfidfTopTerms matches a driver-side smooth-idf model with deterministic ranks") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry"),
      (3L, "durian"),
      (4L, "   ") // empty -> contributes to N, emits no terms
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    // driver model: N=4 docs, df over distinct (doc, term)
    val nDocs = 4.0
    val dfOf = Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 2L, "durian" -> 1L)
    def score(tf: Long, df: Long): Double = {
      val raw = tf * (math.log((nDocs + 1.0) / (df + 1.0)) + 1.0)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toSeq == Seq(
      (1L, "apple", 2L, 1L, score(2, 1), 1),   // rare + doubled beats the rest
      (1L, "banana", 1L, 2L, score(1, 2), 2),  // tie with cherry -> term asc
      (2L, "cherry", 2L, 2L, score(2, 2), 1),
      (2L, "banana", 1L, 2L, score(1, 2), 2),
      (3L, "durian", 1L, 1L, score(1, 1), 1)))
    assert(!got.exists(_._1 == 4L), "token-less docs emit no keyword rows")
  }
}
