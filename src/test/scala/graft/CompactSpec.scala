package graft

import graft.ops.Compact

/** Compaction contract: many small files collapse to the computed
  * generation size with no row loss, and in-place compaction is
  * refused. */
class CompactSpec extends SparkTestBase {

  import spark.implicits._

  test("corpus compaction collapses small files, preserves rows, writes a new generation") {
    val src = java.nio.file.Files.createTempDirectory("graft-compact-src").toString
    // 20 tiny appends — the micro-batch sink pattern
    (0 until 20).foreach { i =>
      Seq((i.toLong, s"doc number $i")).toDF("doc_id", "text")
        .write.mode("append").parquet(src)
    }
    val before = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 20)
    val dest = java.nio.file.Files.createTempDirectory("graft-compact-dst").toString
    val n = Compact.corpus(spark, src, dest) // tiny input -> 1 file
    assert(n == 1)
    val after = new java.io.File(dest).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    // no row loss, identical content
    val a = spark.read.parquet(src).collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(dest).collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.length == 20)
  }

  test("compaction preserves a directory-partitioned layout") {
    val src = java.nio.file.Files.createTempDirectory("graft-compact-psrc").toString
    (0 until 10).foreach { i =>
      Seq((i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de"))
        .toDF("doc_id", "text", "lang")
        .write.mode("append").partitionBy("lang").parquet(src)
    }
    val dest = java.nio.file.Files.createTempDirectory("graft-compact-pdst").toString
    Compact.corpus(spark, src, dest, partitionBy = Seq("lang"))
    val dirs = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=de", "lang=en"))
    // each partition dir coalesced to one file; rows conserved
    dirs.foreach { d =>
      val files = new java.io.File(s"$dest/$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files")
    }
    assert(spark.read.parquet(dest).count() == 10)
  }

  test("in-place compaction is refused") {
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/same-dir", "/tmp/same-dir")
    }
  }

  test("dot-segment and nesting aliases of the source are refused too") {
    // src + "/../<srcname>" IS the source — a raw string compare passes
    // it and overwrite would clobber the live generation
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/gen1", "/tmp/gen1/../gen1")
    }
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/gen1/../gen1", "/tmp/gen1")
    }
    // trailing slash alias
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/gen1", "/tmp/gen1/")
    }
    // nesting in either direction
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/gen1", "/tmp/gen1/sub")
    }
    intercept[IllegalArgumentException] {
      Compact.corpus(spark, "/tmp/gen1/sub", "/tmp/gen1/sub/../..//gen1")
    }
  }
}
