package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.TextOps

/** ScalaCheck invariants for the corpus-layout text operators over random
  * small corpora: n-gram counts match a driver-side sliding-window model,
  * and packing offsets are exactly the per-shard prefix sums of token
  * counts (so every token of the stream is accounted for once). */
object TextOpsProps extends Properties("TextOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val vocab = Vector(
    "spark", "shuffle", "join", "hash", "sort", "key", "value", "table")

  /** Random docs of 0-12 words (short docs and empties included — the
    * boundary cases for windows and packing). */
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(n, Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toList

  property("ngramCounts equals the driver-side sliding-window model") =
    Prop.forAll(genCorpus, Gen.chooseNum(1, 4)) { (corpus, n) =>
      import spark.implicits._
      val got = TextOps.ngramCounts(corpus.toDF("doc_id", "text"), "text", n, topK = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val model = corpus
        .flatMap { case (_, t) =>
          val toks = t.split("\\s+").filter(_.nonEmpty)
          toks.sliding(n).filter(_.length == n).map(_.mkString(" "))
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      Prop(got == model) :| s"got=$got model=$model"
    }

  property("rareTerms equals the driver-side df+rank model") =
    Prop.forAll(genCorpus, Gen.chooseNum(1, 3)) { (corpus, topK) =>
      import spark.implicits._
      val got = TextOps.rareTerms(corpus.toDF("doc_id", "text"), "doc_id", "text", topK)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toList
      val docTerms = corpus.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).distinct.toList
      }
      val df = docTerms.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val model = docTerms.flatMap { case (id, terms) =>
        terms.map(t => (t, df(t))).sortBy { case (t, d) => (d, t) }
          .take(topK).zipWithIndex
          .map { case ((t, d), i) => (id, i + 1, t, d) }
      }.sortBy(x => (x._1, x._2))
      Prop(got == model) :| s"got=$got model=$model"
    }

  property("dedupAgainst equals set difference on normalized text") =
    Prop.forAll(genCorpus, genCorpus) { (hist, inc) =>
      import spark.implicits._
      // offset incoming ids so the frames are distinct rows
      val incoming = inc.map { case (i, t) => (i + 1000L, t) }
      val got = TextOps
        .dedupAgainst(hist.toDF("doc_id", "text"), incoming.toDF("doc_id", "text"), "text")
        .collect().map(_.getLong(0)).sorted.toList
      def norm(t: String) = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
      val seen = hist.map(h => norm(h._2)).toSet
      val model = incoming.filterNot(r => seen(norm(r._2))).map(_._1).sorted
      Prop(got == model) :| s"got=$got model=$model"
    }

  property("pack offsets are the per-shard prefix sums of token counts") =
    Prop.forAll(genCorpus, Gen.chooseNum(1, 16), Gen.chooseNum(1, 4)) {
      (corpus, budget, shards) =>
        import spark.implicits._
        val got = TextOps
          .pack(corpus.toDF("doc_id", "text"), "doc_id", "text", budget, shards)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
          .sortBy(x => (x._1, x._2)).toList
        val model = corpus
          .map { case (id, t) => (id, t.split("\\s+").count(_.nonEmpty).toLong) }
          .filter(_._2 > 0)
          .groupBy { case (id, _) => (id % shards).toInt }
          .toList
          .flatMap { case (shard, rows) =>
            rows.sortBy(_._1).foldLeft((0L, List.empty[(Int, Long, Long, Long, Int)])) {
              case ((off, acc), (id, nTok)) =>
                (off + nTok,
                  acc :+ ((shard, id, nTok, off / budget, (off % budget).toInt)))
            }._2
          }
          .sortBy(x => (x._1, x._2))
        Prop(got == model) :| s"got=$got model=$model"
    }
}
