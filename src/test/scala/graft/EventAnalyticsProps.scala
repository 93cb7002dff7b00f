package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.ops.EventAnalytics

/** Property-test event record (top-level for encoder codegen). */
case class PropEv(event_id: Long, ts: Long, user_id: Long, event_type: String)

/** ScalaCheck properties for the event-analytics operators: funnel counts
  * against a plain-Scala greedy-subsequence model (incl. the windowed
  * first-touch variant), arrival-order invariance (the secondary sort
  * owns ordering, physical row order must not), and retention against a
  * distinct-user-day model. */
object EventAnalyticsProps extends Properties("EventAnalytics") {

  // Spark round-trips per case are ~100ms; keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val steps = Seq("view", "click", "purchase")
  private val dayNs = 86400000000000L

  

  /** Small user/time space so multi-step users and same-ts ties happen. */
  private val genEvents: Gen[List[PropEv]] = for {
    n <- Gen.chooseNum(1, 40)
    users <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    tss <- Gen.listOfN(n, Gen.chooseNum(0L, 20L))
    types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase", "error"))
  } yield users.lazyZip(tss).lazyZip(types).lazyZip(1L to n.toLong).map {
    case (u, t, et, eid) => PropEv(eid, t, u, et)
  }.toList

  private def funnelModel(events: Seq[PropEv], maxSpan: Long): Map[Long, Long] = {
    val depths = events.groupBy(_.user_id).map { case (u, evs) =>
      var depth = 0
      var anchor = 0L
      evs.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        if (depth < steps.size && e.event_type == steps(depth) &&
          (depth == 0 || e.ts - anchor <= maxSpan)) {
          if (depth == 0) anchor = e.ts
          depth += 1
        }
      }
      u -> depth
    }
    (1 to steps.size).map(s => s.toLong -> depths.values.count(_ >= s).toLong).toMap
  }

  private def funnelSpark(events: Seq[PropEv], maxSpan: Long): Map[Long, Long] = {
    import spark.implicits._
    EventAnalytics
      .funnel(events.toDF(), "user_id", "ts", "event_id", "event_type", steps, maxSpan)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  property("funnel counts equal the greedy-subsequence model") =
    Prop.forAll(genEvents) { events =>
      funnelSpark(events, Long.MaxValue) == funnelModel(events, Long.MaxValue)
    }

  property("windowed funnel equals the first-touch-anchored model") =
    Prop.forAll(genEvents, Gen.chooseNum(1L, 10L)) { (events, span) =>
      funnelSpark(events, span) == funnelModel(events, span)
    }

  property("funnel is invariant to physical arrival order") =
    Prop.forAll(genEvents, Gen.chooseNum(0L, Long.MaxValue)) { (events, seed) =>
      val permuted = new scala.util.Random(seed).shuffle(events)
      funnelSpark(permuted, Long.MaxValue) == funnelSpark(events, Long.MaxValue)
    }

  property("retention equals the distinct-user-day model") =
    Prop.forAll(genEvents) { events0 =>
      // spread ticks into distinct days so offsets exercise the window
      val events = events0.map(e => e.copy(ts = e.ts * dayNs / 4))
      import spark.implicits._
      val got = EventAnalytics
        .retention(events.toDF(), "user_id", "ts", maxOffsetDays = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val userDays = events.map(e => (e.user_id, Math.floorDiv(e.ts, dayNs))).distinct
      val first = userDays.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
      val want = userDays
        .map { case (u, d) => (first(u), d - first(u)) }
        .filter(_._2 <= 30)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == want
    }
}
