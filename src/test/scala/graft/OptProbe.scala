package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-benchmarks for the round-21 optimization work: times
  * alternative formulations of hot operators against the current ones
  * (warm pass + min-of-3 noop writes, the QuickTime protocol). Usage:
  * `Test/runMain graft.OptProbe <probe>[,probe...] [cores]`. */
object OptProbe {

  def time(spark: SparkSession, name: String)(df: => DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"OPTPROBE $name min=${ts.min}%.3f iters=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  val sf = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val cores = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.local("graft-optprobe", cores = cores)
    val probes: Map[String, SparkSession => Unit] = Map(
      "sumcost" -> sumCost,
      "profilevariants" -> profileVariants)
    args.headOption.getOrElse("sumcost").split(",").foreach(p => probes(p)(spark))
    spark.stop()
  }

  /** Size the double→decimal(38,6) cast cost inside sums. */
  def sumCost(spark: SparkSession): Unit = {
    val li = Tables.lineitem(spark, sf)
    time(spark, "sum_double_plain") {
      li.agg(sum(col("l_extendedprice")), sum(col("l_quantity")),
        sum(col("l_discount")), sum(col("l_tax")))
    }
    def oldExactSum(c: org.apache.spark.sql.Column) = {
      val finite = when(!isnan(c) && abs(c) < lit(Double.PositiveInfinity), c)
      sum(finite.cast("decimal(38,6)"))
    }
    time(spark, "sum_decimal_cast") {
      li.agg(
        oldExactSum(col("l_extendedprice")),
        oldExactSum(col("l_quantity")),
        oldExactSum(col("l_discount")),
        oldExactSum(col("l_tax")))
    }
    time(spark, "sum_decimal_kernel") {
      li.agg(
        graft.ops.Relational.exactSum(col("l_extendedprice")),
        graft.ops.Relational.exactSum(col("l_quantity")),
        graft.ops.Relational.exactSum(col("l_discount")),
        graft.ops.Relational.exactSum(col("l_tax")))
    }
    // value equality of the two formulations on the real data + products
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val eq = li.agg(
      oldExactSum(col("l_extendedprice")).as("a1"),
      graft.ops.Relational.exactSum(col("l_extendedprice")).as("b1"),
      oldExactSum(disc).as("a2"),
      graft.ops.Relational.exactSum(disc).as("b2")).collect()(0)
    println(s"OPTPROBE sum_equal ${eq.get(0) == eq.get(1) && eq.get(2) == eq.get(3)} row=$eq")
    time(spark, "pricing_current") { graft.ops.Relational.pricingSummary(li) }
  }

  /** q_profile formulations. */
  def profileVariants(spark: SparkSession): Unit = {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    time(spark, "profile_current") { graft.ops.Relational.profile(li, cols) }

    def statsAgg(df: DataFrame): DataFrame = {
      val aggs = cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          graft.ops.Relational.exactSumDouble(col(c)).as(s"${c}__sum"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

    // V1: stats agg (no Expand) x distinct-only multi-distinct agg
    time(spark, "profile_v1_split") {
      val stats = statsAgg(li)
      val dist = li.agg(
        countDistinct(col(cols.head)).as(s"${cols.head}__distinct"),
        cols.tail.map(c => countDistinct(col(c)).as(s"${c}__distinct")): _*)
      stats.crossJoin(dist)
    }

    // V2: stats agg x per-column two-level distinct aggs
    time(spark, "profile_v2_percol") {
      val stats = statsAgg(li)
      val dists = cols.map { c =>
        li.select(col(c)).where(col(c).isNotNull).groupBy(col(c)).agg(lit(1))
          .agg(count(lit(1)).as(s"${c}__distinct"))
      }
      dists.foldLeft(stats)(_ crossJoin _)
    }
  }
}
import org.apache.spark.sql.functions._
object OptProbe2 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe2", cores = 32)
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    time(spark, "sketch_agg_rsd01") {
      val aggs = cols.map(c => approx_count_distinct(col(c), 0.01).as(s"${c}__approx"))
      li.agg(aggs.head, aggs.tail: _*)
    }
    time(spark, "sketch_agg_default_rsd") {
      val aggs = cols.map(c => approx_count_distinct(col(c)).as(s"${c}__approx"))
      li.agg(aggs.head, aggs.tail: _*)
    }
    time(spark, "stats_only") {
      val aggs = cols.flatMap { c => Seq(
        count(col(c)), min(col(c)), max(col(c)),
        graft.ops.Relational.exactSumDouble(col(c))) }
      li.agg(aggs.head, aggs.tail: _*)
    }
    time(spark, "checked_full") {
      graft.ops.Relational.profileApproxChecked(li, cols, rsd = 0.01)
    }
    spark.stop()
  }
}

object OptProbe3 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe3", cores = 32)
    val li = Tables.lineitem(spark, sf)
    val c = "l_extendedprice"
    time(spark, "sketch_one_all_rows") {
      li.agg(approx_count_distinct(col(c), 0.01))
    }
    time(spark, "sketch_one_distinct") {
      li.select(col(c)).where(col(c).isNotNull).distinct()
        .agg(count(lit(1)), approx_count_distinct(col(c), 0.01))
    }
    time(spark, "distinct_count_only") {
      li.select(col(c)).where(col(c).isNotNull).distinct().agg(count(lit(1)))
    }
    spark.stop()
  }
}

object OptProbe4 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe4", cores = 32)
    val li = Tables.lineitem(spark, sf)
    val c = "l_extendedprice"
    for (mf <- Seq("100", "2048", "8192")) {
      spark.conf.set("spark.sql.codegen.maxFields", mf)
      time(spark, s"sketch_one_all_rows_maxFields_$mf") {
        li.agg(approx_count_distinct(col(c), 0.01))
      }
    }
    spark.conf.set("spark.sql.codegen.maxFields", "8192")
    time(spark, "checked_full_maxFields8192") {
      graft.ops.Relational.profileApproxChecked(li,
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"), rsd = 0.01)
    }
    spark.stop()
  }
}

object OptProbe5 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe5", cores = 32)
    val docs = Tables.documents(spark, sf)
    // --- winnow family stages ---
    time(spark, "winnow_kernel_only") {
      docs.select(col("doc_id").as("id"),
        graft.ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
    }
    time(spark, "winnow_explode") {
      docs.select(col("doc_id").as("id"),
        graft.ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
        .select(col("id"), explode(col("__fp")).as("f"))
    }
    time(spark, "winnow_filtered") {
      docs.select(col("doc_id").as("id"),
        graft.ops.TextOps.winnowFingerprints(col("text"), 8, 4).as("__fp"))
        .select(col("id"), explode(col("__fp")).as("f"))
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
        .filter(col("__df") <= 100)
    }
    time(spark, "winnow_pairs_full") {
      graft.ops.NearDup.winnowPairs(docs, "doc_id", "text")
    }
    // --- jaccard family stages ---
    time(spark, "shingle_hash_kernel") {
      docs.select(col("doc_id").as("id"),
        graft.functions.native.shingleHashes(col("text"), 3).as("__h"))
    }
    time(spark, "jaccard_candidates") {
      graft.ops.NearDup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.8)
    }
    time(spark, "jaccard_full") {
      graft.ops.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    }
    spark.stop()
  }
}

object OptProbe6 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe6", cores = 32)
    val docs = Tables.documents(spark, sf)
    time(spark, "lm_score_current") {
      graft.ops.TextOps.unigramLmScore(docs, "doc_id", "text")
    }
    time(spark, "lm_score_sort_first") {
      val lm = graft.ops.TextOps.trainUnigramLm(docs, "text", 65536)
      val nTok = graft.ops.TextOps.tokenCount(col("text"))
      val sorted = docs.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      sorted.select(
          col("doc_id"),
          nTok.cast("bigint").as("n_tokens"),
          lm.avgNll(col("text")).as("avg_nll"))
        .select(col("doc_id"), col("n_tokens"), col("avg_nll"),
          round(exp(col("avg_nll")), 6).as("ppl"))
    }
    // show the sort-first plan to confirm the kernel stays above the exchange
    val lm = graft.ops.TextOps.trainUnigramLm(docs, "text", 65536)
    val sorted = docs.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
    val plan = sorted.select(col("doc_id"),
      lm.avgNll(col("text")).as("avg_nll")).queryExecution.executedPlan.toString
    println("OPTPROBE plan_kernel_above_exchange=" +
      (plan.indexOf("unigram_nll") < plan.indexOf("Exchange rangepartitioning")))
    spark.stop()
  }
}

object OrderCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-ordercheck", cores = 32)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    def sortedAsc(name: String, keys: Seq[String]): Unit = {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      val keyed = rows.map(r => keys.map(k => r.getAs[Any](k) match {
        case l: Long => l; case i: Int => i.toLong; case null => Long.MinValue
      }))
      val ok = keyed.zip(keyed.drop(1)).forall { case (a, b) =>
        a.zip(b).foldLeft(0) { case (c, (x, y)) =>
          if (c != 0) c else java.lang.Long.compare(x, y) } <= 0
      }
      println(s"ORDERCHECK $name rows=${rows.length} sorted=$ok")
    }
    sortedAsc("q_chunk", Seq("doc_id", "chunk_ix"))
    sortedAsc("q_quantize", Seq("vec_id", "i"))
    sortedAsc("q_lm_score", Seq("doc_id"))
    sortedAsc("q_lm_score2", Seq("doc_id"))
    sortedAsc("q_dsir", Seq("doc_id"))
    sortedAsc("q_gopher", Seq("doc_id"))
    sortedAsc("q_quality", Seq("doc_id"))
    sortedAsc("q_quality_clf", Seq("doc_id"))
    sortedAsc("q_entropy", Seq("doc_id"))
    sortedAsc("q_repetition", Seq("doc_id"))
    sortedAsc("q_doc_bytes", Seq("doc_id"))
    spark.stop()
  }
}

object OptProbe7 {
  import OptProbe.{time, sf}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-optprobe7", cores = 32)
    val docs = Tables.documents(spark, sf)
    val t = col("text")
    val toks = split(trim(regexp_replace(t, "\\s+", " ")), " ")
    val stop = Seq("the","be","to","of","and","that","have","with")
    time(spark, "gopher_full") {
      graft.ops.TextOps.gopherQuality(docs.select("doc_id","text"), "doc_id", "text", minStopwordHits = 1)
    }
    time(spark, "gopher_no_alpha") {
      docs.select(col("doc_id"),
        graft.ops.TextOps.tokenCount(t).cast("bigint").as("n_tokens"),
        size(array_intersect(array_distinct(toks), array(stop.map(lit): _*))).as("hits"),
        (length(t) - length(regexp_replace(t, "[ \\t\\n\\f\\r]", ""))).as("spaces"))
    }
    time(spark, "gopher_alpha_only") {
      docs.select(col("doc_id"),
        size(filter(toks, x => x.rlike("[a-zA-Z]"))).as("alpha"))
    }
    time(spark, "gopher_hits_only") {
      docs.select(col("doc_id"),
        size(array_intersect(array_distinct(toks), array(stop.map(lit): _*))).as("hits"))
    }
    time(spark, "gopher_ntok_only") {
      docs.select(col("doc_id"), graft.ops.TextOps.tokenCount(t).cast("bigint").as("n"))
    }
    spark.stop()
  }
}
