package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ad-hoc probe: doc-freq via window-over-s (current) vs groupBy+join
  * (map-side combinable partial agg; join side left to AQE) for the
  * prefix-filter candidate stage.
  * Run: sbt "Test/runMain graft.JacProbe2 /root/testdata/sf0.1 32" */
object JacProbe2 {
  val W = org.apache.spark.sql.expressions.Window

  def candsJoin(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"), graft.ops.NearDup.shingles(col(textCol), k).as("__sh"))
      .select(col("id"), size(col("__sh")).as("n"), explode(col("__sh")).as("s"))
    val docFreq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sh = exploded.join(docFreq, "s")
    val prefixLen =
      col("n") - ceil(col("n") * (threshold * (1 - 1e-12)) - lit(1e-9)) + 1
    val prefix = sh
      .withColumn("rk",
        row_number().over(W.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rk") <= prefixLen)
    val sizeCompatible =
      col("n1") * (threshold * (1 - 1e-12)) <= col("n2") &&
        col("n2") * (threshold * (1 - 1e-12)) <= col("n1")
    prefix.select(col("s"), col("id").as("id1"), col("n").as("n1"))
      .join(prefix.select(col("s"), col("id").as("id2"), col("n").as("n2")), "s")
      .filter(col("id1") < col("id2") && sizeCompatible)
      .select(col("id1"), col("id2"))
      .distinct()
  }

  def fullJoin(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame =
    graft.ops.NearDup.jaccardVerify(
      candsJoin(df, idCol, textCol, k, threshold), df, idCol, textCol, k, threshold)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("graft-jac-probe2", cores = cores)
    def time(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JACPROBE2 $name%-18s ${runs.min}%8.2f s (${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    // parity first
    val a = graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val b = fullJoin(docs, "doc_id", "text", 3, 0.8)
    val onlyA = a.select("id1", "id2").exceptAll(b.select("id1", "id2")).count()
    val onlyB = b.select("id1", "id2").exceptAll(a.select("id1", "id2")).count()
    println(s"JACPROBE2 parity onlyA=$onlyA onlyB=$onlyB (must be 0/0)")
    time("cands-window")(graft.ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8))
    time("cands-join")(candsJoin(docs, "doc_id", "text", 3, 0.8))
    time("full-window")(graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    time("full-join")(fullJoin(docs, "doc_id", "text", 3, 0.8))
    spark.stop()
  }
}

/** v3: hash-ordered prefix — no doc-freq at all. Any global total order
  * keeps the prefix filter lossless; hash order is computable per-row
  * inside the shingle array (sort + slice before exploding), so the
  * candidate stage has ZERO pre-join shuffles and joins on an 8-byte
  * hash instead of the shingle string (collisions only add candidates;
  * the verify stage rejects them).
  * Run: sbt "Test/runMain graft.JacProbe3 /root/testdata/sf0.1 32" */
object JacProbe3 {
  import JacProbe2.W

  def candsHash(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val prefixLen =
      col("n") - ceil(col("n") * (threshold * (1 - 1e-12)) - lit(1e-9)) + 1
    val prefix = df
      .select(col(idCol).as("id"), graft.ops.NearDup.shingles(col(textCol), k).as("__sh"))
      .select(col("id"), size(col("__sh")).as("n"),
        expr("transform(__sh, x -> xxhash64(x))").as("__h"))
      .select(col("id"), col("n"),
        explode(slice(sort_array(col("__h")), lit(1), prefixLen.cast("int"))).as("h"))
    val sizeCompatible =
      col("n1") * (threshold * (1 - 1e-12)) <= col("n2") &&
        col("n2") * (threshold * (1 - 1e-12)) <= col("n1")
    prefix.select(col("h"), col("id").as("id1"), col("n").as("n1"))
      .join(prefix.select(col("h"), col("id").as("id2"), col("n").as("n2")), "h")
      .filter(col("id1") < col("id2") && sizeCompatible)
      .select(col("id1"), col("id2"))
      .distinct()
  }

  def fullHash(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame =
    graft.ops.NearDup.jaccardVerify(
      candsHash(df, idCol, textCol, k, threshold), df, idCol, textCol, k, threshold)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("graft-jac-probe3", cores = cores)
    def time(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JACPROBE3 $name%-18s ${runs.min}%8.2f s (${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    val a = graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val b = fullHash(docs, "doc_id", "text", 3, 0.8)
    val onlyA = a.select("id1", "id2").exceptAll(b.select("id1", "id2")).count()
    val onlyB = b.select("id1", "id2").exceptAll(a.select("id1", "id2")).count()
    println(s"JACPROBE3 parity onlyA=$onlyA onlyB=$onlyB (must be 0/0)")
    println("JACPROBE3 cand volume: window=" +
      graft.ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8).count() +
      " hash=" + candsHash(docs, "doc_id", "text", 3, 0.8).count())
    time("cands-hash")(candsHash(docs, "doc_id", "text", 3, 0.8))
    time("full-hash")(fullHash(docs, "doc_id", "text", 3, 0.8))
    time("full-window")(graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    spark.stop()
  }
}
