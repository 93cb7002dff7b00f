package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The SQL surface of the native expressions: every kernel callable from
  * `spark.sql(...)` and equal to its Column-API twin. */
class GraftFunctionsSpec extends SparkTestBase {

  import spark.implicits._

  GraftFunctions.register(spark)

  test("simhash64 / md5_hash64 / cosine_sim via SQL equal the Column API") {
    Seq((1L, "the quick brown fox"), (2L, "  the   quick brown fox "))
      .toDF("id", "text").createOrReplaceTempView("t_docs")
    val sql = spark.sql("SELECT id, simhash64(text) AS sh, md5_hash64(text) AS h FROM t_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val api = Seq((1L, "the quick brown fox"), (2L, "  the   quick brown fox "))
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.native.simhash64(col("text")),
        graft.functions.native.md5Hash64(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sql == api)
    assert(sql(0)._2 == sql(1)._2, "whitespace variants must share a simhash")

    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("t_vecs")
    val c = spark.sql("SELECT cosine_sim(a, b) AS c FROM t_vecs").collect()(0).getDouble(0)
    assert(math.abs(c - 10.0 / 14.0) < 1e-12)
  }

  test("latest_row as a SQL aggregate materializes the changelog") {
    Seq((1L, 10L, "old"), (1L, 11L, "new"), (2L, 5L, "only"))
      .toDF("k", "seq", "v").createOrReplaceTempView("t_events")
    val got = spark.sql(
      "SELECT k, latest_row(struct(seq, v), seq).v AS v FROM t_events GROUP BY k ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "only")))
  }

  test("shingle/winnow/char-class functions parse and run from SQL") {
    Seq((1L, "alpha beta gamma delta"))
      .toDF("id", "text").createOrReplaceTempView("t_one")
    val r = spark.sql(
      """SELECT size(word_shingles(text, 3)) AS ns,
        |       size(minhash_signature(word_shingles(text, 3), 16)) AS np,
        |       size(winnow_fingerprints(text, 8, 4)) AS nw,
        |       char_class_counts(text)[3] AS ntok
        |FROM t_one""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 16 && r.getInt(2) > 0 && r.getLong(3) == 4L)
    // round-7 kernels are first-class in SQL too
    val r2 = spark.sql(
      """SELECT word_ngrams(text, 2) AS grams,
        |       word_chunks(text, 3, 2) AS chunks,
        |       size(shingle_hashes(text, 3)) AS nh
        |FROM t_one""".stripMargin).collect()(0)
    assert(r2.getSeq[String](0) == Seq("alpha beta", "beta gamma", "gamma delta"))
    assert(r2.getSeq[String](1) == Seq("alpha beta gamma", "gamma delta"))
    assert(r2.getInt(2) == 2)
    // media_dims: GIF header (320x240 LE) through the SQL path
    val gif: Array[Byte] =
      "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00)
    Seq(Tuple1(gif)).toDF("bytes").createOrReplaceTempView("t_media")
    val r3 = spark.sql("SELECT media_dims(bytes) AS d FROM t_media").collect()(0)
    assert(r3.getSeq[Int](0) == Seq(320, 240))
    // char_entropy: 'abab' = ln 2 through the SQL path
    val r4 = spark.sql("SELECT char_entropy('abab') AS e, char_entropy('') AS e0")
      .collect()(0)
    assert(r4.getDouble(0) == math.log(2.0) && r4.isNullAt(1))
    // av_meta: a minimal WAV (16 kHz mono 16-bit, 2 s of declared
    // payload) through the SQL path — struct fields addressable by name
    import MediaBytes.{le32, wavFile, wavFmt}
    val wav: Array[Byte] = wavFile(wavFmt(1, 16000, 32000, 16) ++
      "data".getBytes ++ le32(64000))
    Seq(Tuple1(wav)).toDF("bytes").createOrReplaceTempView("t_wav")
    val r5 = spark.sql(
      "SELECT av_meta(bytes).container AS c, av_meta(bytes).duration_ms AS d, " +
        "av_meta(bytes).sample_rate AS sr FROM t_wav").collect()(0)
    assert(r5.getString(0) == "wav" && r5.getLong(1) == 2000L && r5.getInt(2) == 16000)
  }

  test("char_ngrams / quantize_int8 / remove_spans / window_fingerprints are SQL-callable") {
    // the r20 review found these four registerable (literal-only extra
    // args) but absent from the registry despite the module's
    // every-kernel-is-first-class claim
    val r = spark.sql(
      """SELECT char_ngrams('abcd', 3) AS cg,
        |       quantize_int8(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT))).codes AS q8,
        |       remove_spans('a b c d e', array(1), 2) AS rs,
        |       size(window_fingerprints('a b c d e', 3)) AS wf""".stripMargin)
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("abc", "bcd"))
    assert(r.getSeq[Byte](1).size == 2)
    assert(r.getString(2) == "a d e", s"tokens 1-2 cut: '${r.getString(2)}'")
    assert(r.getInt(3) == 3)
    // and they equal their Column-API twins
    import spark.implicits._
    val api = Seq(Tuple1("abcd")).toDF("t")
      .select(graft.functions.native.charNgrams(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(api == Seq("abc", "bcd"))
  }

  test("mistyped arguments fail ANALYSIS, not silently reinterpret bits (r20 review finding)") {
    // cosine_sim over int arrays previously passed analysis and read
    // int bit patterns as floats — a plausible-looking wrong
    // similarity. ExpectsInputTypes now rejects at analysis time.
    Seq((Array(1, 2, 3), Array(3, 2, 1))).toDF("a", "b")
      .createOrReplaceTempView("t_intvecs")
    val e1 = intercept[Exception] {
      spark.sql("SELECT cosine_sim(a, b) FROM t_intvecs").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("type") &&
      e1.getMessage.contains("cosine_sim"), e1.getMessage)
    // scalar-typed misuse fails analysis too — previously a Janino
    // fallback + ClassCastException at runtime
    val e2 = intercept[Exception] {
      spark.sql("SELECT simhash64(42)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"), e2.getMessage)
    // minhash over array<bigint> (hashes, not shingles) is rejected
    val e3 = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L, 2L), 16)").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("type"), e3.getMessage)
    // media_dims over a string (the base64 temptation) is rejected
    val e4 = intercept[Exception] {
      spark.sql("SELECT media_dims('not bytes')").collect()
    }
    assert(e4.getMessage.toLowerCase.contains("type"), e4.getMessage)
  }

  test("minhash_signature maps EMPTY shingle arrays to NULL via SQL (r20 review finding)") {
    // a shorter-than-k doc has no shingles; without the guard it would
    // carry the identical all-Long.MaxValue signature as every other
    // short doc and they'd all collide into one LSH bucket
    val r = spark.sql(
      "SELECT minhash_signature(word_shingles('tiny doc', 9), 16) AS sig").collect()(0)
    assert(r.isNullAt(0), s"empty shingle array must yield NULL, got ${r.get(0)}")
    // non-empty inputs keep their signatures (and the guard is
    // codegen-path too — this query runs through WholeStageCodegen)
    val ok = spark.sql(
      "SELECT minhash_signature(word_shingles('a b c d e f g h i j', 3), 16) AS sig")
      .collect()(0)
    assert(!ok.isNullAt(0) && ok.getSeq[Long](0).size == 16)
  }

  test("media_dims returns NULL for a hostile PNG header (negative dims), not garbage") {
    // width 2^31 (high bit set) reads negative through signed be32 —
    // the contract is null for corrupt containers, like BMP/TIFF
    val bad: Array[Byte] = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](8)(0) ++
      Array[Byte](0x80.toByte, 0, 0, 0) ++ // width = Int.MinValue
      Array[Byte](0, 0, 0, 100) ++          // height = 100
      Array.fill[Byte](4)(0)
    Seq(Tuple1(bad)).toDF("bytes").createOrReplaceTempView("t_badpng")
    assert(spark.sql("SELECT media_dims(bytes) FROM t_badpng").collect()(0).isNullAt(0))
    // a sane PNG still parses (64x48)
    val good: Array[Byte] = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](8)(0) ++
      Array[Byte](0, 0, 0, 64) ++ Array[Byte](0, 0, 0, 48) ++ Array.fill[Byte](4)(0)
    Seq(Tuple1(good)).toDF("bytes").createOrReplaceTempView("t_goodpng")
    assert(spark.sql("SELECT media_dims(bytes) FROM t_goodpng")
      .collect()(0).getSeq[Int](0) == Seq(64, 48))
  }

  test("non-literal size parameters are rejected with a clear error") {
    Seq((1L, "x y z")).toDF("id", "text").createOrReplaceTempView("t_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, id) FROM t_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("word_shingles"))
  }

  test("out-of-Int-range literal parameters are rejected, not truncated") {
    // 4294967297L truncates to 1 under a silent .toInt — the function
    // would "work" with perms=1 and produce garbage signatures
    Seq((1L, "x y z")).toDF("id", "text").createOrReplaceTempView("t_range")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(word_shingles(text, 3), 4294967297) FROM t_range")
        .collect()
    }
    assert(e.getMessage.contains("out of Int range") || e.getMessage.contains("4294967297"))
  }

  test("GraftExtensions injects the same function set at session build time") {
    // The extensions object is exercised directly (a second SparkSession
    // build is expensive and getOrCreate would return the shared one);
    // injectFunction paths through the identical (name, info, builder)
    // triples that `register` installs.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registers all
    assert(GraftFunctions.all.map(_._1).distinct.size == GraftFunctions.all.size)
    // the DOCUMENTED config string must be the class that loads: Spark's
    // extension loader does Class.forName on the spark.sql.extensions
    // value, so pin the exact FQCN the README/SURVEY name (the class
    // previously sat in graft.functions and the documented string threw
    // ClassNotFoundException — r20 review finding)
    val loaded = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    loaded(new SparkSessionExtensions) // must not throw either
  }
}
