package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Changelog

/** The insert→update→delete→reinsert lifecycle of the reference's
  * tombstone guide (/root/reference/TOMBSTONE_HANDLING_GUIDE.md:149-205),
  * table-driven over the batch changelog core. */
class ChangelogSpec extends SparkTestBase {

  import spark.implicits._

  // One key's full lifecycle, seq = event_id (the Kafka-offset stand-in).
  private val lifecycle = Seq(
    Ev(1L, 1L, "insert", 10.0),
    Ev(1L, 2L, "update", 20.0),
    Ev(1L, 3L, "delete", 0.0),
    Ev(1L, 4L, "insert", 30.0)
  )

  private def state(events: Seq[Ev]): Map[Long, (Long, Double)] =
    Changelog
      .applyChangelog(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect()
      .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("event_id"), r.getAs[Double]("value"))))
      .toMap

  test("insert materializes the key") {
    assert(state(lifecycle.take(1)) == Map(1L -> ((1L, 10.0))))
  }

  test("update supersedes insert") {
    assert(state(lifecycle.take(2)) == Map(1L -> ((2L, 20.0))))
  }

  test("delete removes the key (tombstone wins)") {
    assert(state(lifecycle.take(3)) == Map.empty)
  }

  test("re-insert after delete resurrects the key") {
    assert(state(lifecycle) == Map(1L -> ((4L, 30.0))))
  }

  test("a NULL deletion-predicate result counts as deleted (raw-tombstone agreement)") {
    // a raw tombstone retained as the latest row is (key, NULL…), so a
    // field predicate evaluates NULL exactly there; batch state must drop
    // the key — matching SQL WHERE NOT(pred), PullQuery.liveState, and
    // ReplicationPipeline.isDeletion, so batch and streaming state can
    // never disagree on tombstones
    val rows = Seq(
      (1L, 1L, Some("insert"), Some(10.0)),
      (1L, 2L, None: Option[String], None: Option[Double]), // raw tombstone
      (2L, 3L, Some("insert"), Some(5.0))
    ).toDF("user_id", "event_id", "event_type", "value")
    val live = Changelog
      .applyChangelog(rows, Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect().map(_.getAs[Long]("user_id")).toSet
    assert(live == Set(2L), "the NULL-predicate (tombstoned) key must not survive")
  }

  test("arrival order does not matter — only sequence order does") {
    // The delete arriving physically last must still lose to the later
    // re-insert; a shuffled changelog replays to the same state.
    val shuffled = Seq(lifecycle(3), lifecycle(0), lifecycle(2), lifecycle(1))
    assert(state(shuffled) == state(lifecycle))
  }

  test("independent keys do not interfere") {
    val events = lifecycle ++ Seq(Ev(2L, 5L, "insert", 1.0), Ev(3L, 6L, "delete", 0.0))
    assert(state(events) == Map(1L -> ((4L, 30.0)), 2L -> ((5L, 1.0))))
  }

  test("liveCount = keys whose latest event is not a delete") {
    val events = lifecycle ++ Seq(Ev(2L, 5L, "insert", 1.0), Ev(3L, 6L, "delete", 0.0))
    val n = Changelog
      .liveCount(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect()(0)
      .getLong(0)
    assert(n == 2L)
  }

  test("latestByKey keeps every column of the winning row") {
    val df: DataFrame = lifecycle.take(2).toDF()
    val rows = Changelog.latestByKey(df, Seq("user_id"), col("event_id")).collect()
    assert(rows.length == 1)
    assert(rows(0).schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
  }

  test("scd2: versions close at the next event, tombstones close without opening") {
    // lifecycle: insert(1) → update(2) → delete(3) → insert(4).
    // Expected history: v1=[1,2) closed by the update, v2=[2,3) closed
    // by the TOMBSTONE (which itself emits no version), v4=[4,∞) open.
    val rows = Changelog
      .scd2(lifecycle.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .orderBy(col("valid_from_seq"))
      .collect()
      .map(r => (r.getAs[Long]("valid_from_seq"),
        Option(r.getAs[java.lang.Long]("valid_to_seq")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
    assert(rows.toSeq == Seq(
      (1L, Some(2L), false),
      (2L, Some(3L), false),
      (4L, None, true)))
  }

  test("scd2 is_current slice equals applyChangelog state") {
    val events = (lifecycle ++ Seq(Ev(2L, 5L, "insert", 1.0), Ev(3L, 6L, "delete", 0.0))).toDF()
    val current = Changelog
      .scd2(events, Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .filter(col("is_current"))
      .select("user_id", "event_id", "event_type", "value")
    val applied = Changelog
      .applyChangelog(events, Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .select("user_id", "event_id", "event_type", "value")
    assert(current.exceptAll(applied).isEmpty && applied.exceptAll(current).isEmpty)
  }

  test("scd2: a key whose history ends in a tombstone has no current version") {
    val rows = Changelog
      .scd2(lifecycle.take(3).toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .collect()
    assert(rows.forall(!_.getAs[Boolean]("is_current")))
    assert(rows.length == 2) // the delete row itself is not a version
  }

  test("stateAt equals applyChangelog over the sequence prefix") {
    // the time-travel read's one-line correctness argument, checked at
    // every interesting cut point of the lifecycle (before/at/after the
    // delete and the re-insert)
    val events = (lifecycle ++ Seq(Ev(2L, 5L, "insert", 1.0), Ev(3L, 6L, "delete", 0.0))).toDF()
    for (at <- 1L to 6L) {
      val travel = Changelog
        .stateAt(events, Seq("user_id"), col("event_id"), col("event_type") === "delete", at)
        .select("user_id", "event_id", "event_type", "value")
      val prefix = Changelog
        .applyChangelog(events.filter(col("event_id") <= at),
          Seq("user_id"), col("event_id"), col("event_type") === "delete")
        .select("user_id", "event_id", "event_type", "value")
      assert(travel.exceptAll(prefix).isEmpty && prefix.exceptAll(travel).isEmpty,
        s"stateAt($at) diverged from the prefix replay")
    }
  }

  test("composite sequence: struct(ts, offset) breaks ts ties by offset") {
    val df = Seq(
      (1L, 100L, 1L, "a"),
      (1L, 100L, 2L, "b")
    ).toDF("user_id", "ts", "offset", "payload")
    val got = Changelog
      .latestByKey(df, Seq("user_id"), struct(col("ts"), col("offset")))
      .collect()(0)
      .getAs[String]("payload")
    assert(got == "b")
  }
}
