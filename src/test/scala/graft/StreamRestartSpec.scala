package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming._

/** Kill → restart-from-checkpoint → RESUME, pinned for every stateful
  * streaming component (the reference's core operational claim: state is
  * rebuilt from the changelog topic and processing RESUMES, it does not
  * restart from scratch — TOMBSTONE_HANDLING_GUIDE's RocksDB-recovery
  * posture; reference: docker-compose.yaml ksqlDB state dirs).
  *
  * Shared harness (the HeavyHittersStreamSpec pattern, generalized): run
  * the query over a MemoryStream on one checkpoint, feed a first slice of
  * the data, STOP; start a FRESH query on the SAME checkpoint whose fresh
  * MemoryStream is pre-loaded with the first slice under the identical
  * chunking (replayed source offsets are the source's duty — Kafka serves
  * them; the checkpoint's committed offsets then SKIP them), feed the
  * rest. The single assertion "gen-1 ∪ gen-2 output == uninterrupted
  * run's output, exactly once" proves both halves of the claim at once:
  * state resumed (facts spanning the restart appear) and committed work
  * did not re-emit (no duplicates). Each test also pins a
  * component-specific cross-restart fact — a closed version, a drained
  * timer, a displaced winner — so a silently-fresh state store cannot
  * pass by accident. */
class StreamRestartSpec extends SparkTestBase {

  import spark.implicits._

  graft.streaming.ChangelogStream.configure(spark)

  /** Two query generations over ONE checkpoint; returns (gen-1 rows,
    * gen-2 rows) as collected by foreachBatch across all micro-batches.
    * Chunks must be non-empty: each chunk is one MemoryStream block, and
    * the gen-2 pre-load must reproduce gen-1's block boundaries exactly
    * for the committed offsets to line up. */
  private def runRestarted[I: Encoder](
      build: DataFrame => DataFrame,
      firstChunks: Seq[Seq[I]],
      secondChunks: Seq[Seq[I]],
      outputMode: String = "append"): (Seq[Row], Seq[Row]) = {
    require((firstChunks ++ secondChunks).forall(_.nonEmpty),
      "empty chunks would misalign replayed MemoryStream offsets")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart").toString
    def generation(pre: Seq[Seq[I]], feed: Seq[Seq[I]]): Seq[Row] = {
      val input = MemoryStream[I](spark)
      pre.foreach(c => input.addData(c))
      val got = ArrayBuffer[Row]()
      val q = build(input.toDF()).writeStream
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch.collect()
          got.synchronized { got ++= rows }
          ()
        }
        .start()
      try feed.foreach { c => input.addData(c); q.processAllAvailable() }
      finally q.stop()
      got.toSeq
    }
    val g1 = generation(Nil, firstChunks)
    val g2 = generation(firstChunks, secondChunks)
    (g1, g2)
  }

  // ---------------------------------------------------------------- scd2

  test("Scd2Stream: restart resumes the frontier; closed history exact, no re-emission") {
    val rnd = new scala.util.Random(7)
    val events = (1L to 120L).map { seq =>
      Ev(rnd.nextInt(12).toLong, seq,
        if (rnd.nextInt(5) == 0) "delete" else "update", rnd.nextInt(1000).toDouble)
    }
    val chunks = events.grouped(20).toSeq
    val (g1, g2) = runRestarted[Ev](
      df => Scd2Stream.closedVersions[Long, Ev](
        df.as[Ev], _.user_id, _.event_id,
        e => e.event_type == null || e.event_type == "delete").toDF(),
      chunks.take(3), chunks.drop(3))
    def fact(r: Row) = {
      val ev = r.getStruct(0)
      (ev.getLong(0), ev.getLong(1), r.getLong(1), r.getLong(2))
    }
    val combined = (g1 ++ g2).map(fact)
    val batch = graft.ops.Changelog
      .scd2(events.toDF(), Seq("user_id"), col("event_id"), col("event_type") === "delete")
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("valid_from_seq"), r.getAs[Long]("valid_to_seq")))
    assert(combined.toSet == batch.toSet, "resumed history diverged from the batch replay")
    assert(combined.size == batch.length, "a closed fact re-emitted across the restart")
    // the resumption witness: a version OPENED before the restart must be
    // CLOSED after it — impossible with a silently-fresh state store
    assert(g2.map(fact).exists { case (_, _, from, to) => from <= 60L && to > 60L },
      "no closed fact spans the restart boundary — state did not resume")
  }

  // ----------------------------------------------------------- transitions

  test("TransitionsStream: restart resumes last-type state; pair spans the boundary") {
    val rnd = new scala.util.Random(13)
    val types = Seq("view", "click", "purchase", "error")
    val events = (1L to 150L).map { seq =>
      Ev(rnd.nextInt(8).toLong, seq, types(rnd.nextInt(4)), 0.0)
    }
    val chunks = events.grouped(25).toSeq
    val (g1, g2) = runRestarted[Ev](
      df => TransitionsStream.pairs[Long, Ev](
        df.as[Ev], _.user_id, _.event_id, _.event_type).toDF(),
      chunks.take(3), chunks.drop(3))
    val combined = (g1 ++ g2).map(r => (r.getString(0), r.getString(1)))
    val batchPairs: Map[(String, String), Long] = graft.ops.EventAnalytics
      .transitions(
        events.map(e => (e.user_id, e.event_id, e.event_id, e.event_type))
          .toDF("user_id", "ts_ns", "event_id", "event_type"),
        "user_id", "ts_ns", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = combined.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // multiset equality == exactly-once: every pair counted once, which
    // can only hold if each key's last-type state crossed the restart
    // (75 of 150 events arrive after it) AND no pre-restart pair re-emitted
    assert(streamed == batchPairs, s"resumed pair counts diverged:\n$streamed\nvs\n$batchPairs")
    assert(g2.nonEmpty && g1.nonEmpty)
  }

  // ---------------------------------------------------------------- dedup

  test("DedupStream: restart resumes the fingerprint set; cross-restart duplicates drop") {
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val first = Seq(Seq(SDoc(1, "alpha", ts(0)), SDoc(2, "beta", ts(1))))
    val second = Seq(
      Seq(SDoc(3, "alpha", ts(2)), SDoc(4, "gamma", ts(3))), // 3 duplicates gen-1's 1
      Seq(SDoc(5, "beta", ts(4)), SDoc(6, "delta", ts(5))))  // 5 duplicates gen-1's 2
    val (g1, g2) = runRestarted[SDoc](
      DedupStream.dedup(_, "text"), first, second)
    def ids(rows: Seq[Row]) = rows.map(_.getLong(0))
    // gen 2 must drop 3 and 5 (their texts live in the RESUMED state) and
    // must not re-emit 1 or 2 (their offsets are committed)
    assert(ids(g1).sorted == Seq(1L, 2L))
    assert(ids(g2).sorted == Seq(4L, 6L),
      s"cross-restart duplicates leaked or survivors re-emitted: ${ids(g2)}")
  }

  // -------------------------------------------------------------- near-dup

  test("NearDupStream: restart resumes bucket members; cross-restart candidates pair") {
    val corpus = Seq(
      NDoc(0L, "the quick brown fox jumps over the lazy dog again and again today"),
      NDoc(1L, "the quick  brown fox jumps over the lazy dog again and again today"),
      NDoc(2L, "the quick brown fox leaps over the lazy dog again and again today"),
      NDoc(3L, "completely different content about spark catalyst optimizer internals"),
      NDoc(4L, "the quick brown cat sat still watching birds in the garden quietly"))
    val (g1, g2) = runRestarted[NDoc](
      df => NearDupStream.candidatePairs(df, "doc_id", "text").toDF(),
      Seq(corpus.take(2)), Seq(corpus.drop(2)), outputMode = "update")
    val pairs = (g1 ++ g2).map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
    val batchPairs = graft.ops.NearDup
      .minhashCandidatePairs(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == batchPairs, s"stream $pairs != batch $batchPairs")
    // the witness: a pre-restart doc pairing with a post-restart arrival
    // requires its signature to still sit in the resumed bucket state
    assert(g2.map(r => (r.getLong(0), r.getLong(1)))
      .exists { case (a, b) => a <= 1L && b >= 2L },
      "no candidate spans the restart — bucket state did not resume")
  }

  // ------------------------------------------------------------ source cap

  test("SourceCapStream: restart resumes winner sets; post-restart arrival evicts a pre-restart winner") {
    // feed ids in DESCENDING digest rank, one per micro-batch: every
    // arrival displaces the current winner, so the gen-2 arrivals MUST
    // evict winners added before the restart
    val ids = (0L to 5L)
    val ranked = ids.map(CapDoc(_, "s")).toDF("doc_id", "source")
      .withColumn("ck", md5(concat(lit("cap:"), col("source"), lit(":"), col("doc_id"))))
      .orderBy(desc("ck"))
      .collect().map(r => CapDoc(r.getLong(0), r.getString(1))).toSeq
    val chunks = ranked.map(Seq(_))
    val (g1, g2) = runRestarted[CapDoc](
      df => SourceCapStream.capped(df, "doc_id", "source", cap = 1).toDF(),
      chunks.take(3), chunks.drop(3), outputMode = "update")
    def changes(rows: Seq[Row]) = rows.map(r => (r.getLong(1), r.getString(2)))
    val folded = (changes(g1) ++ changes(g2)).foldLeft(Set.empty[Long]) { (acc, c) =>
      if (c._2 == "add") acc + c._1 else acc - c._1
    }
    val batchIds = graft.ops.TextOps
      .sourceCap(ids.map(CapDoc(_, "s")).toDF("doc_id", "source"), "doc_id", "source", cap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(folded == batchIds, "resumed fold diverged from the batch survivor set")
    // gen 2's first arrival outranks everything gen 1 held: its add must
    // come with an evict of the winner the RESUMED state remembers
    val gen1Winner = ranked(2).doc_id
    assert(changes(g2).contains((gen1Winner, "evict")),
      s"the pre-restart winner $gen1Winner was not evicted — winner state did not resume")
  }

  // --------------------------------------------------------------- rolling

  test("RollingStream: restart resumes the event buffer and emission frontier") {
    val windowNs = 100_000_000_000L // 100-second trailing frame
    def t(sec: Long): Long = (1000 + sec) * 1_000_000L
    val gen1 = Seq(
      Seq(RollEv(1L, t(0), 1, Some(10.0)), RollEv(1L, t(20), 2, Some(20.0))),
      // this chunk's watermark (t(150) − 30 s) EMITS the earlier rows in
      // gen 1, pinning the emission frontier against re-emission
      Seq(RollEv(1L, t(150), 3, Some(30.0))))
    val gen2 = Seq(
      // frames reach back 100 s: t(170)'s frame must hold t(150)'s 30.0
      // from the RESUMED buffer
      Seq(RollEv(1L, t(170), 4, Some(40.0)), RollEv(2L, t(175), 5, Some(5.0))),
      Seq(RollEv(999L, 1_000_000_000_000L, 0L, Some(0.0))),
      Seq(RollEv(999L, 1_000_100_000_000L, 1L, Some(0.0))))
    val evs = gen1.flatten ++ gen2.take(1).flatten
    val (g1, g2) = runRestarted[RollEv](
      df => RollingStream.rolling(
        df.withColumn("ts", timestamp_micros(col("ts_us"))),
        "key", "ts", "seq", "value", windowNs, "30 seconds").toDF(),
      gen1, gen2)
    def row(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    val combined = (g1 ++ g2).map(row).filterNot(_._1 == 999L)
    val batch = graft.ops.Windowing.rollingStats(
        evs.toDF("key", "ts_us", "seq", "value")
          .withColumn("ts_ns", col("ts_us") * 1000L),
        "key", "ts_ns", "seq", "value", windowNs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(combined.sortBy(e => (e._1, e._2, e._3)) == batch.sortBy(e => (e._1, e._2, e._3)).toSeq,
      "resumed rolling rows diverged from batch")
    assert(combined.size == evs.size, "a row re-emitted or went missing across the restart")
    assert(g1.nonEmpty, "fixture must emit something before the restart")
    // the buffer witness: seq 4's frame sums the pre-restart 30.0 too
    assert(combined.find(_._3 == 4L).exists(r => r._4 == 2L && r._5.contains(70.0)),
      "post-restart frame lost pre-restart events — buffer did not resume")
  }

  // -------------------------------------------------------------- gap fill

  test("GapFillStream: restart re-arms event-time timers; interior gaps drain on watermark alone") {
    val stepUs = 10_000_000L // 10-second grid
    def t(slot: Long, off: Long): Long = (slot + 1000) * stepUs + off
    val gen1 = Seq(
      Seq(GfEv(1L, t(0, 100), 1, 1.0), GfEv(1L, t(0, 200), 2, 2.0)),
      // slots 1,2 become interior gaps behind the slot-3 observation
      Seq(GfEv(1L, t(3, 0), 3, 3.0)),
      // the 30 s delay (3 slots) puts the watermark at slot 1's start
      // after this batch — slot 0 is then closable...
      Seq(GfEv(1L, t(4, 0), 4, 4.0)),
      // ...and the watermark advance lands one batch later (wm updates at
      // batch END), so this chunk's batch EMITS slot 0 inside gen 1,
      // pinning the emission frontier against post-restart re-emission
      Seq(GfEv(1L, t(4, 100), 5, 4.5)))
    val gen2 = Seq(
      // watermark pushers ONLY — no key-1 arrivals. Draining slots 1..3
      // after the restart therefore requires the RE-ARMED timer plus the
      // resumed pending buffer; a fresh state store would emit nothing
      Seq(GfEv(999L, 1_000_000_000_000L, 0L, 0.0)),
      Seq(GfEv(999L, 1_000_100_000_000L, 1L, 0.0)))
    val evs = gen1.flatten
    val (g1, g2) = runRestarted[GfEv](
      df => GapFillStream.filled(
        df.withColumn("ts", timestamp_micros(col("ts_us"))),
        "key", "ts", "seq", "value", stepUs, "30 seconds").toDF(),
      gen1, gen2)
    def slot(r: Row) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val combined = (g1 ++ g2).map(slot).filterNot(_._1 == 999L)
    val batch = graft.ops.Windowing.gapFill(
        evs.toDF("key", "ts_us", "seq", "value")
          .withColumn("ts_ns", col("ts_us") * 1000L),
        "key", "ts_ns", "seq", "value", stepNs = stepUs * 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(combined.sortBy(_._2) == batch.sortBy(_._2).toSeq,
      "resumed gap-fill slots diverged from batch")
    assert(combined.size == batch.length, "a slot re-emitted across the restart")
    // slot 0 closed BEFORE the restart; the filled slots 1,2 drained AFTER
    assert(g1.map(slot).exists(s => s._1 == 1L && s._2 == t(0, 0)))
    val drained = g2.map(slot).filterNot(_._1 == 999L)
    assert(drained.count(_._4) == 2 && drained.exists(s => s._3 == 2.0 && s._4),
      s"interior gaps did not drain from the re-armed timer: $drained")
  }

  // ----------------------------------------------------------------- drift

  test("DriftStream: restart resumes open-window histograms; split window matches batch KS") {
    val windowNs = 60_000_000_000L // 1-minute windows
    val reference = Map(1.0 -> 4L, 2.0 -> 3L, 3.0 -> 2L, 10.0 -> 1L)
    def t(win: Long, offSec: Long): Long = (1000 * 60 + win * 60 + offSec) * 1_000_000L
    val w0 = Seq(1.0, 1.0, 2.0, 3.0, 2.0)
    val w1 = Seq(50.0, 60.0, 50.0, 2.0)
    val gen1 = Seq(
      w0.zipWithIndex.map { case (v, i) => DriftEv(t(0, i.toLong), v) },
      // w1's first half plus a pusher 35 s into w1: watermark t(1,35)−30 s
      // closes w0 IN GEN 1 while w1 stays open across the restart
      w1.take(2).zipWithIndex.map { case (v, i) => DriftEv(t(1, i.toLong), v) } :+
        DriftEv(t(1, 35), w1(2)))
    val gen2 = Seq(
      Seq(DriftEv(t(1, 40), w1(3))), // the open window's post-restart half
      Seq(DriftEv(1_000_000_000_000L, 1.0)),
      Seq(DriftEv(1_000_100_000_000L, 1.0)))
    val (g1, g2) = runRestarted[DriftEv](
      df => DriftStream.ksAgainstReference(
        df.withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "value", windowNs, reference, "30 seconds").toDF(),
      gen1, gen2)
    def win(r: Row) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    val combined = (g1 ++ g2).map(win).filter(_._1 < 500_000_000_000_000L)
    def batchKs(values: Seq[Double]): Double = {
      val refRows = reference.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)(v) }
      graft.ops.Relational.ksDrift(values.toDF("v"), refRows.toDF("v"), "v")
        .collect()(0).getAs[Double]("ks_stat")
    }
    assert(combined.size == 2, s"windows must emit exactly once: $combined")
    assert(g1.map(win).exists(_._2 == w0.size.toLong), "w0 must close before the restart")
    val w1Row = combined.find(_._2 == w1.size.toLong)
    assert(w1Row.isDefined,
      "the split window lost its pre-restart half — histogram state did not resume")
    assert(w1Row.get._3 == batchKs(w1), "split window's KS diverged from batch")
    assert(combined.find(_._2 == w0.size.toLong).get._3 == batchKs(w0))
  }

  // ---------------------------------------------------------------- funnel

  test("FunnelStream: restart resumes per-user depth; a post-restart event advances it") {
    val steps = Seq("view", "click", "purchase")
    val gen1 = Seq(
      Seq(FunnelEvent(1L, 10L, 1L, "view"), FunnelEvent(2L, 11L, 2L, "view")),
      Seq(FunnelEvent(2L, 12L, 3L, "click")))
    val gen2 = Seq(
      // user 1's click advances 1→2 ONLY against the resumed depth (a
      // fresh store at depth 0 would not match step "view" and emit
      // nothing); user 2's purchase completes 2→3 the same way
      Seq(FunnelEvent(1L, 20L, 4L, "click"), FunnelEvent(2L, 21L, 5L, "purchase")),
      Seq(FunnelEvent(3L, 22L, 6L, "click"))) // never saw "view": no emission
    val (g1, g2) = runRestarted[FunnelEvent](
      df => FunnelStream.funnelDepths(df.as[FunnelEvent], steps).toDF(),
      gen1, gen2, outputMode = "update")
    def depths(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getInt(1)))
    // update mode emits each advancement in its own micro-batch: user 2
    // advances to 1 (chunk 1) and again to 2 (chunk 2)
    assert(depths(g1).toSet == Set((1L, 1), (2L, 1), (2L, 2)))
    assert(depths(g2).toSet == Set((1L, 2), (2L, 3)),
      s"post-restart advancement diverged — depth state did not resume: ${depths(g2)}")
  }

  // ------------------------------------------------------------- gap alert

  test("GapAlertStream: restart re-arms the dead-man timer from the resumed last-seen") {
    def ts(sec: Long) = Seq((1000 + sec) * 1_000_000L)
    def ev(key: Long, sec: Long): (Long, Long) = (key, (1000 + sec) * 1_000_000L)
    val gapUs = 60_000_000L // 60 s silence
    val gen1 = Seq(
      Seq(ev(1L, 0)),      // key 1 heartbeats once, then goes silent
      Seq(ev(999L, 400)),  // watermark pusher: wm = 370 s > key 1's 60 s deadline
      Seq(ev(2L, 405), ev(999L, 410))) // key 1's timer FIRES here; key 2 appears
    val gen2 = Seq(
      // watermark pushers only: key 2's alert can come ONLY from the
      // re-armed timer over the resumed last-seen (no key-2 arrivals)
      Seq(ev(999L, 1000)),
      Seq(ev(999L, 1100)))
    val (g1, g2) = runRestarted[(Long, Long)](
      df => GapAlertStream.alerts(
        df.toDF("key", "ts_us").withColumn("ts", timestamp_micros(col("ts_us"))),
        "key", "ts", gapUs, "30 seconds").toDF(),
      gen1, gen2)
    def alerts(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).filterNot(_._1 == 999L)
    assert(alerts(g1) == Seq((1L, ts(0).head)),
      s"key 1's silence must alert before the restart: ${alerts(g1)}")
    assert(alerts(g2) == Seq((2L, ts(405).head)),
      s"key 2's alert must fire from the RESUMED timer after the restart: ${alerts(g2)}")
  }

  // ------------------------------------------------------------- retention

  test("RetentionStream: restart resumes the cohort anchor and seen-offset set") {
    val day = RetentionStream.DayNanos
    val gen1 = Seq(
      Seq(ActivityEvent(1L, 5 * day + 7), ActivityEvent(2L, 6 * day + 1)),
      Seq(ActivityEvent(1L, 7 * day + 3))) // offsets seen for user 1: {0, 2}
    val gen2 = Seq(
      // user 1 active on day 8: offset 3 AGAINST THE RESUMED ANCHOR day 5
      // (a fresh store would re-anchor at day 8 and emit offset 0);
      // day 7 again: offset 2 already in the resumed seen-set → silence
      Seq(ActivityEvent(1L, 8 * day + 9), ActivityEvent(1L, 7 * day + 500)),
      Seq(ActivityEvent(2L, 9 * day))) // user 2: offset 3 off anchor day 6
    val (g1, g2) = runRestarted[ActivityEvent](
      df => RetentionStream.retentionDeltas(df.as[ActivityEvent]).toDF(),
      gen1, gen2, outputMode = "update")
    def deltas(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(deltas(g1).toSet == Set((1L, 5L, 0L), (2L, 6L, 0L), (1L, 5L, 2L)))
    assert(deltas(g2).toSet == Set((1L, 5L, 3L), (2L, 6L, 3L)),
      s"post-restart deltas must anchor on the resumed cohort day: ${deltas(g2)}")
  }

  // --------------------------------------------------------- interval join

  test("IntervalJoinStream: restart resumes both sides' buffers; cross-restart rows join") {
    def ts(minutes: Long): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + minutes * 60000L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ij").toString
    val got1 = ArrayBuffer[(Long, Long, Long)]()
    val got2 = ArrayBuffer[(Long, Long, Long)]()
    def generation(
        got: ArrayBuffer[(Long, Long, Long)],
        pre: Seq[(Seq[PEv], Seq[EEv])],
        feed: Seq[(Seq[PEv], Seq[EEv])]): Unit = {
      val pIn = MemoryStream[PEv](spark)
      val eIn = MemoryStream[EEv](spark)
      pre.foreach { case (ps, es) =>
        if (ps.nonEmpty) pIn.addData(ps)
        if (es.nonEmpty) eIn.addData(es)
      }
      val out = IntervalJoinStream.intervalJoin(
        pIn.toDF(), eIn.toDF(),
        keys = Seq("user_id"), leftTs = "p_ts", rightTs = "e_ts",
        lowerSeconds = -600, upperSeconds = 0, delay = "5 minutes")
      val q = out.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch.collect().map(r => (r.getLong(r.fieldIndex("user_id")),
            r.getLong(r.fieldIndex("p_id")), r.getLong(r.fieldIndex("e_id"))))
          got.synchronized { got ++= rows }
          ()
        }
        .start()
      try feed.foreach { case (ps, es) =>
        if (ps.nonEmpty) pIn.addData(ps)
        if (es.nonEmpty) eIn.addData(es)
        q.processAllAvailable()
      } finally q.stop()
    }
    // gen 1: purchases buffer with one in-window match; gen 2: new errors
    // landing in PRE-RESTART purchases' windows — joinable only if the
    // left buffer survived the restart
    val purchases = Seq(PEv(1L, 10L, ts(20)), PEv(2L, 11L, ts(21)))
    val err1 = Seq(EEv(1L, 100L, ts(15)))
    val err2 = Seq(EEv(2L, 101L, ts(18)), EEv(1L, 102L, ts(16)))
    val gen1 = Seq((purchases, err1))
    val gen2 = Seq(
      (Seq.empty[PEv], err2),
      (Seq(PEv(-1L, -1L, ts(10000))), Seq(EEv(-1L, -1L, ts(10000)))))
    generation(got1, Nil, gen1)
    generation(got2, gen1, gen2)
    val combined = (got1.toSeq ++ got2.toSeq).filterNot(_._2 == -1L)
    val batch = for {
      p <- purchases; e <- err1 ++ err2
      if e.user_id == p.user_id &&
        e.e_ts.getTime > p.p_ts.getTime - 600000L && e.e_ts.getTime <= p.p_ts.getTime
    } yield (p.user_id, p.p_id, e.e_id)
    assert(combined.sorted == batch.sorted, "resumed interval join diverged from batch")
    assert(combined.size == batch.size, "a join row re-emitted across the restart")
    assert(got1.toSeq.contains((1L, 10L, 100L)), "the pre-restart match must emit in gen 1")
    assert(got2.toSeq.count(_._2 != -1L) == 2,
      "cross-restart matches did not emit — join buffers did not resume")
  }
}
