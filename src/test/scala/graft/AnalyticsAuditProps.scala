package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.ops.{Changelog, EventAnalytics, Relational}

/** ScalaCheck properties for the round-12 analytics/audit operators:
  * each distributed result is checked against a plain-Scala model on
  * random inputs (the EventAnalyticsProps posture), plus the structural
  * invariants the statistics must keep (chi² label-permutation
  * invariance, PSI symmetry, arrival-order independence). */
object AnalyticsAuditProps extends Properties("AnalyticsAudit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Keyed changelog with deletes; event_id is the unique global seq. */
  private val genChangelog: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 40)
    users <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    types <- Gen.listOfN(n, Gen.frequency(4 -> Gen.const("update"), 1 -> Gen.const("delete")))
  } yield users.lazyZip(types).lazyZip(1L to n.toLong).map {
    case (u, t, eid) => Ev(u, eid, t, eid.toDouble)
  }.toList

  private def scd2Model(events: Seq[Ev]): Set[(Long, Long, Option[Long], Boolean)] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val s = evs.sortBy(_.event_id)
      val next = s.drop(1).map(e => Some(e.event_id)) :+ None
      s.zip(next).collect {
        case (e, nx) if e.event_type != "delete" =>
          (u, e.event_id, nx, nx.isEmpty)
      }
    }.toSet

  property("scd2 equals the sorted-zip interval model") =
    Prop.forAll(genChangelog) { events =>
      import spark.implicits._
      val got = Changelog
        .scd2(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("valid_from_seq"),
          Option(r.getAs[java.lang.Long]("valid_to_seq")).map(_.longValue),
          r.getAs[Boolean]("is_current")))
        .toSet
      got == scd2Model(events)
    }

  property("scd2 is invariant to physical arrival order") =
    Prop.forAll(genChangelog, Gen.chooseNum(0L, Long.MaxValue)) { (events, seed) =>
      import spark.implicits._
      val permuted = new scala.util.Random(seed).shuffle(events)
      def run(evs: Seq[Ev]) = Changelog
        .scd2(evs.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
        .collect().map(_.toSeq).toSet
      run(permuted) == run(events)
    }

  private val genEvents: Gen[List[PropEv]] = for {
    n <- Gen.chooseNum(1, 40)
    users <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    tss <- Gen.listOfN(n, Gen.chooseNum(0L, 20L))
    types <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield users.lazyZip(tss).lazyZip(types).lazyZip(1L to n.toLong).map {
    case (u, t, et, eid) => PropEv(eid, t * 1500L, u, et)
  }.toList

  private def transitionsModel(events: Seq[PropEv]): Set[(String, String, Long, Long, Double)] = {
    val pairs = events.groupBy(_.user_id).toSeq.flatMap { case (_, evs) =>
      val s = evs.sortBy(e => (e.ts, e.event_id)).map(_.event_type)
      s.zip(s.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    counts.map { case ((p, nx), c) =>
      (p, nx, c, totals(p), c.toDouble / totals(p))
    }.toSet
  }

  property("transitions equal the per-key sorted-pair model") =
    Prop.forAll(genEvents) { events =>
      import spark.implicits._
      val got = EventAnalytics
        .transitions(events.toDF("event_id", "ts", "user_id", "event_type"),
          "user_id", "ts", "event_id", "event_type")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      got == transitionsModel(events)
    }

  property("transition probabilities are row-stochastic (sum to 1 per prev)") =
    Prop.forAll(genEvents) { events =>
      import spark.implicits._
      val rows = EventAnalytics
        .transitions(events.toDF("event_id", "ts", "user_id", "event_type"),
          "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._1).forall { case (_, g) =>
        g.map(_._2).sum == g.head._3 // Σ n_pairs == the shared n_from
      }
    }

  private def disorderModel(events: Seq[PropEv]): Set[(Long, Long, Long, Option[Long])] =
    events.groupBy(_.user_id).map { case (u, evs) =>
      val s = evs.sortBy(_.event_id)
      var best = Long.MinValue
      var regressions = 0L
      var worst = Option.empty[Long]
      s.foreach { e =>
        if (best != Long.MinValue && e.ts < best) {
          regressions += 1
          val late = Math.floorDiv(best - e.ts, 1000L)
          worst = Some(worst.fold(late)(math.max(_, late)))
        }
        best = math.max(best, e.ts)
      }
      (u, s.size.toLong, regressions, worst)
    }.toSet

  property("disorderAudit equals the running-max model") =
    Prop.forAll(genEvents) { events =>
      import spark.implicits._
      val got = EventAnalytics
        .disorderAudit(events.toDF("event_id", "ts", "user_id", "event_type"),
          "user_id", "ts", "event_id")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_regressions"),
          Option(r.getAs[java.lang.Long]("max_late_us")).map(_.longValue)))
        .toSet
      got == disorderModel(events)
    }

  private val genCategorical: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(1, 60)
    as <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
    bs <- Gen.listOfN(n, Gen.oneOf("p", "q"))
  } yield as.zip(bs)

  property("chi2 is non-negative and invariant under label permutation") =
    Prop.forAll(genCategorical) { rows =>
      import spark.implicits._
      def chi2(rs: Seq[(String, String)]): Double =
        Relational.chi2Independence(rs.toDF("a", "b"), "a", "b")
          .collect()(0).getAs[Double]("chi2")
      val base = chi2(rows)
      // bijective relabeling of both axes must not move the statistic:
      // chi2 depends only on the partition, never the label identities
      val relabeled = rows.map { case (a, b) => ("label_" + a, b + "_tag") }
      base >= 0.0 && base == chi2(relabeled)
    }

  private val genValues: Gen[List[Double]] = for {
    n <- Gen.chooseNum(1, 50)
    vs <- Gen.listOfN(n, Gen.chooseNum(-10, 150))
  } yield vs.map(_.toDouble)

  property("psi is symmetric and zero on identical sides") =
    Prop.forAll(genValues, genValues) { (a, b) =>
      import spark.implicits._
      def psi(x: Seq[Double], y: Seq[Double]): Double =
        Relational.psiDrift(x.toDF("v"), y.toDF("v"), "v", 0.0, 100.0, 5)
          .collect()(0).getAs[Double]("psi")
      psi(a, b) == psi(b, a) && psi(a, a) == 0.0
    }

  property("kanon equals the model filter at any k") =
    Prop.forAll(genCategorical, Gen.chooseNum(2, 10)) { (rows, k) =>
      import spark.implicits._
      val got = Relational
        .kAnonymityAudit(rows.toDF("a", "b"), Seq("a", "b"), k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = rows.groupBy(identity).collect {
        case ((a, b), g) if g.size < k => (a, b, g.size.toLong)
      }.toSet
      got == want
    }

  property("stateAt at the max sequence equals the applied changelog") =
    Prop.forAll(genChangelog) { events =>
      import spark.implicits._
      val at = events.map(_.event_id).max
      val travel = Changelog
        .stateAt(events.toDF(), Seq("user_id"), col("event_id"),
          col("event_type") === "delete", at)
        .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val applied = Changelog
        .applyChangelog(events.toDF(), Seq("user_id"), col("event_id"),
          col("event_type") === "delete")
        .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      travel == applied
    }
}
