package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.Changelog

/** ScalaCheck properties for the changelog core (SURVEY.md §5.2.3): the
  * materialized state is a pure function of the event SET — any physical
  * arrival order (permutation) replays to identical state, and liveCount
  * equals distinct keys minus tombstoned keys. */
object ChangelogProps extends Properties("Changelog") {

  // Spark round-trips per case are ~100ms; keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  /** Events with globally-unique sequence numbers over a small key space —
    * small enough that permutation collisions (multiple events per key)
    * actually happen. */
  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 30)
    keys <- Gen.listOfN(n, Gen.chooseNum(1L, 6L))
    types <- Gen.listOfN(n, Gen.oneOf("insert", "update", "delete"))
    values <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield keys.lazyZip(types).lazyZip(values).lazyZip(1L to n.toLong).map {
    case (k, t, v, seq) => Ev(k, seq, t, v)
  }.toList

  private def replay(events: Seq[Ev]): Map[Long, (Long, String)] = {
    import spark.implicits._
    Changelog
      .applyChangelog(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("event_id"), r.getAs[String]("event_type"))))
      .toMap
  }

  /** Reference model: plain-Scala fold, highest seq wins, delete drops. */
  private def model(events: Seq[Ev]): Map[Long, (Long, String)] =
    events
      .groupBy(_.user_id)
      .map { case (k, evs) => k -> evs.maxBy(_.event_id) }
      .collect { case (k, ev) if ev.event_type != "delete" => k -> ((ev.event_id, ev.event_type)) }

  property("replay equals the per-key fold model") = Prop.forAll(genEvents) { events =>
    replay(events) == model(events)
  }

  property("any permutation replays to the same state") =
    Prop.forAll(genEvents, Gen.chooseNum(0L, Long.MaxValue)) { (events, seed) =>
      val permuted = new scala.util.Random(seed).shuffle(events)
      replay(permuted) == replay(events)
    }

  property("liveCount = distinct keys - tombstoned keys") = Prop.forAll(genEvents) { events =>
    import spark.implicits._
    val n = Changelog
      .liveCount(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect()(0)
      .getLong(0)
    n == model(events).size.toLong
  }
}
