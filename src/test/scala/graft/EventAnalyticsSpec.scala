package graft

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  // (event_id, ts, user_id, event_type)
  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  test("funnel counts greedy in-order subsequence matches, zero-filling unreached steps") {
    val events = ev(
      // user 1 completes the funnel in order
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      // user 2: purchase BEFORE click — depth stops at click
      (4L, 10L, 2L, "view"), (5L, 15L, 2L, "purchase"), (6L, 20L, 2L, "click"),
      // user 3: only noise
      (7L, 10L, 3L, "error"), (8L, 20L, 3L, "click"),
      // user 4: view only
      (9L, 10L, 4L, "view"))
    val got = EventAnalytics
      .funnel(events, "user_id", "ts", "event_id", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel breaks same-timestamp ties by event_id") {
    // click (eid 2) sorts after view (eid 1) at the same ts -> full depth;
    // swapping the ids reverses the order and breaks the chain at view
    val forward = ev((1L, 10L, 1L, "view"), (2L, 10L, 1L, "click"))
    val reversed = ev((2L, 10L, 1L, "view"), (1L, 10L, 1L, "click"))
    def depths(df: org.apache.spark.sql.DataFrame) = EventAnalytics
      .funnel(df, "user_id", "ts", "event_id", "event_type", Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(depths(forward) == Map(1L -> 1L, 2L -> 1L))
    assert(depths(reversed) == Map(1L -> 1L, 2L -> 0L))
  }

  test("windowed funnel anchors at the FIRST step-1 event and never re-anchors") {
    val events = ev(
      // user 1: purchase lands outside the 100-tick window of the first view
      (1L, 0L, 1L, "view"), (2L, 50L, 1L, "click"), (3L, 200L, 1L, "purchase"),
      // a SECOND view at t=150 must NOT re-anchor the window
      (4L, 150L, 1L, "view"),
      // user 2: full funnel inside the window
      (5L, 0L, 2L, "view"), (6L, 40L, 2L, "click"), (7L, 90L, 2L, "purchase"))
    def counts(span: Long) = EventAnalytics
      .funnel(events, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"), maxSpan = span)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(counts(100L) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L)) // user 1 stops at click
    assert(counts(1000L) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L)) // wide window: both convert
  }

  test("funnel drops NULL user/ts/event_id rows instead of NPE-ing or shifting depths") {
    // java.lang.Long columns so nulls survive into the frame
    val events = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String)](
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"),
      (3L, null, 1L, "purchase"),  // null ts — unattributable, must not count
      (4L, 30L, null, "view"),     // null user
      (null, 40L, 2L, "view"))     // null event_id
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics
      .funnel(events, "user_id", "ts", "event_id", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("funnel rejects empty and duplicate step lists") {
    val events = ev((1L, 10L, 1L, "view"))
    intercept[IllegalArgumentException](
      EventAnalytics.funnel(events, "user_id", "ts", "event_id", "event_type", Seq.empty))
    intercept[IllegalArgumentException](
      EventAnalytics.funnel(events, "user_id", "ts", "event_id", "event_type", Seq("a", "a")))
  }

  test("retention cohorts by first active day and counts distinct active users per offset") {
    val day = 86400000000000L
    val events = ev(
      // user 1: days 0, 1, 3 (two events on day 1 must not double count)
      (1L, 0L, 1L, "view"), (2L, day + 1L, 1L, "view"), (3L, day + 2L, 1L, "click"),
      (4L, 3 * day, 1L, "view"),
      // user 2: days 1, 3
      (5L, day, 2L, "view"), (6L, 3 * day, 2L, "view"),
      // user 3: day 0 only
      (7L, 5L, 3L, "view"))
    val got = EventAnalytics.retention(events, "user_id", "ts")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // users 1, 3 cohort day 0
      (0L, 1L) -> 1L, // user 1 back on day 1
      (0L, 3L) -> 1L, // user 1 back on day 3
      (1L, 0L) -> 1L, // user 2 cohort day 1
      (1L, 2L) -> 1L  // user 2 back on day 3 (offset 2)
    ))
  }

  test("retention maxOffsetDays caps the reported window") {
    val day = 86400000000000L
    val events = ev((1L, 0L, 1L, "view"), (2L, 40 * day, 1L, "view"))
    val got = EventAnalytics.retention(events, "user_id", "ts", maxOffsetDays = 30)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L))) // the day-40 return falls outside the cap
  }
}
