package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.{NearDup, TextOps}
import org.apache.spark.sql.functions._

/** ScalaCheck invariants for the dedup/near-dup family over random small
  * corpora: MinHash never invents a pair the exact operator wouldn't
  * (the verify stage makes precision exact), and fingerprint-keyed dedup
  * matches the group-by-text model. */
object NearDupProps extends Properties("NearDup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val vocab = Vector(
    "spark", "shuffle", "join", "hash", "sort", "key", "value", "table",
    "stream", "batch", "merge", "filter", "agg", "window", "column")

  /** Random docs of 3-20 words over a tiny vocabulary (so shingle
    * collisions and real near-dups occur), some exact duplicates. */
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 15)
    docs <- Gen.listOfN(n, Gen.chooseNum(3, 20).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    dups <- Gen.someOf(docs)
  } yield (docs ++ dups).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toList

  property("minhash pairs are a subset of exact-Jaccard pairs with identical scores") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      val exact = NearDup.exactJaccardPairs(df, "doc_id", "text", 3, 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val mh = NearDup.minhashNearDupPairs(df, "doc_id", "text", 3, 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      mh.forall { case (pair, score) => exact.get(pair).contains(score) }
    }

  property("prefix-filtered exact pairs equal a driver-side all-pairs Jaccard model (both orders)") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      // independent model: plain-Scala shingles + all-pairs Jaccard —
      // losslessness of the prefix filter (under BOTH global orders) and
      // of the size filter rides on this
      def shingles(t: String): Set[String] = {
        val w = t.trim.split("\\s+").filter(_.nonEmpty)
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val sets = corpus.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
      val model = (for {
        (i, a) <- sets; (j, b) <- sets if i < j
        inter = (a & b).size
        j2 = inter.toDouble / (a.size + b.size - inter)
        if j2 >= 0.6
      } yield (i, j) -> j2).toMap
      Seq("hash", "docfreq").forall { order =>
        val got = NearDup.exactJaccardPairs(df, "doc_id", "text", 3, 0.6, order)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        got == model
      }
    }

  property("collapseNearDups equals a driver-side union-find over the pair graph") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      val pairs = NearDup.exactJaccardPairs(df, "doc_id", "text", 3, 0.6)
      val got = NearDup.collapseNearDups(df, "doc_id", pairs.select("id1", "id2"))
        .collect().map(_.getLong(0)).toSet
      // independent model: union-find, survivors = component minima +
      // unpaired docs
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.select("id1", "id2").collect().foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val ids = corpus.map(_._1)
      val model = ids.groupBy(find).values.map(_.min).toSet
      got == model
    }

  property("exactDedup equals the per-text fold model") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      val got = TextOps.exactDedup(df, "text", "doc_id")
        .collect().map(r => (r.getString(1), r.getLong(0))).toMap
      val model = corpus.groupBy(_._2).map { case (t, rows) => t -> rows.map(_._1).min }
      got == model
    }

  property("crossSourceMatrix equals the canonical pair-count model") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      // assign sources by id parity, pairs from the exact operator
      val docs = corpus.toDF("doc_id", "text")
        .withColumn("source",
          when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
      val pairs = NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      val got = NearDup.crossSourceMatrix(docs, "doc_id", "source", pairs)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      def srcOf(id: Long) = if (id % 2 == 0) "even" else "odd"
      val model = pairs.select("id1", "id2").collect()
        .map { r =>
          val (a, b) = (srcOf(r.getLong(0)), srcOf(r.getLong(1)))
          (if (a <= b) (a, b) else (b, a))
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      Prop(got == model) :| s"got=$got model=$model"
    }

  property("simhash explode+aggregate equals the HOF formulation") =
    Prop.forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      val agg = NearDup.simhashes(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hof = df.select(col("doc_id"), NearDup.simhash64(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      agg == hof
    }
}
