package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** The PLANS.md shuffle claims, measured: operators that promise "the
  * text never enters an exchange" must move only fingerprint/id-sized
  * bytes through shuffles, and broadcast-side operators must shuffle
  * almost nothing. Plan-shape tests catch a reintroduced exchange;
  * these catch an exchange that exists but silently got WIDE. */
class ShuffleBytesSpec extends SparkTestBase {

  /** Total shuffle-write bytes across all stages of `body`. */
  private def shuffleBytes(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        total.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.GraftSparkTestHooks.flushListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get()
  }

  private lazy val corpusTextBytes: Long =
    Tables.documents(spark, sf01)
      .agg(sum(octet_length(col("text")))).collect()(0).getLong(0)

  test("normalized dedup shuffles fingerprints, not documents") {
    val b = shuffleBytes {
      SparkEntry.queries("q_dedup_norm")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    // 16-byte md5 + id per doc ≪ corpus text; generous 20% bound covers
    // serialization framing and the tiny oracle sort
    assert(b < corpusTextBytes / 5, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("bloom-gated dedup never exchanges more than the exact path, and no text") {
    // the gate's claim, metered: definite-new incoming rows skip the
    // anti-join exchange entirely, so the bloom flavor's total shuffle
    // bytes stay at-or-below the exact flavor's on the same split (the
    // history-side fingerprint distinct is the irreducible cost of
    // EXACT incremental dedup and is paid by both)
    val docs = Tables.documents(spark, sf01)
    val history = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val exact = shuffleBytes {
      graft.ops.TextOps.dedupAgainst(history, incoming, "text")
        .write.format("noop").mode("overwrite").save()
    }
    val bloom = shuffleBytes {
      graft.ops.TextOps.dedupAgainstBloom(history, incoming, "text",
        expectedItems = 1L << 16, fpp = 0.01)
        .write.format("noop").mode("overwrite").save()
    }
    // the bloom build itself is treeAggregate (map + driver merge, no
    // exchange), so the gate cannot ADD shuffle; 1.05 covers metric jitter
    assert(bloom <= (exact * 1.05).toLong, s"bloom=$bloom exact=$exact")
    assert(bloom < corpusTextBytes / 5, s"shuffled $bloom bytes vs corpus $corpusTextBytes")
  }

  test("probeMinhashIndex exchanges signatures and id pairs, never document text") {
    val docs = Tables.documents(spark, sf01)
    val history = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-meter").toString
    graft.ops.NearDup.writeMinhashIndex(history, "doc_id", "text", dir)
    val b = shuffleBytes {
      graft.ops.NearDup.probeMinhashIndex(dir, history, batch, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    // candidates travel as bare id pairs, verify shingles only for the
    // semi-joined candidate docs — total exchange ≪ the corpus text
    assert(b < corpusTextBytes / 2, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("paragraphDedup shuffles tile fingerprints plus ONE output sort, never exploded tile text") {
    val b = shuffleBytes {
      SparkEntry.queries("q_paradup")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    // the exchanges are (id, tile_ix, md5) fingerprint rows, the small
    // cut lists, and the declared query's final ORDER BY — one range
    // exchange of the REBUILT output text (≤ 1× corpus). What must NOT
    // appear is the exploded per-tile text (~1× corpus AGAIN on top,
    // through the canonical-pick aggregate); 2× total pins that.
    assert(b < corpusTextBytes * 2, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("substringDedup shuffles 16-byte window digests, never the L-times-amplified window text") {
    val b = shuffleBytes {
      SparkEntry.queries("q_substring_dedup")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    // stride-1 occurrences are (id 8B, pos 4B, digest 16B) per corpus
    // TOKEN — ~28/6 ≈ 5× the corpus text bytes through the canonical
    // aggregate, the honest O(n) of ExactSubstr; plus cut lists and the
    // declared ORDER BY's one output exchange. What must NOT appear is
    // the materialized 10-token window TEXT (~10× corpus ON TOP —
    // the kernel digests in place precisely so it never exists as rows);
    // 8× total pins digests-only with margin while any text
    // materialization would at least double it.
    assert(b < corpusTextBytes * 8, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("decontamination never shuffles the training corpus") {
    val b = shuffleBytes {
      SparkEntry.queries("q_decontaminate")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    assert(b < corpusTextBytes / 5, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("exact-Jaccard near-dup keeps the corpus out of every exchange") {
    // the flagship claim: candidates exchange 8-byte prefix hashes and
    // id pairs; the verify stage broadcasts the (small) pair set so the
    // shingle arrays never shuffle — total exchange bytes must stay
    // below even the RAW text volume (the exploded shingle volume is a
    // multiple of it). r22: the candidate self-join is merge-hinted so
    // the prefix rows go through ONE real exchange (reused by both
    // sides — the kernel runs once) instead of a broadcast that hid
    // the bytes by re-evaluating the pipeline; the bound moves from
    // corpus/2 to corpus — still far under the shingle volume a text
    // exchange would show, and PlanSpec separately pins that no
    // exchange carries the text column.
    val b = shuffleBytes {
      SparkEntry.queries("q_neardup_jaccard")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    assert(b < corpusTextBytes, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("the changelog combine ships at most keys-per-partition rows, not events") {
    val eventBytes: Long = {
      val e = Tables.withTsMicros(Tables.events(spark, sf01))
      e.agg(sum(octet_length(to_json(struct(e.columns.map(col): _*)))))
        .collect()(0).getLong(0)
    }
    val b = shuffleBytes {
      SparkEntry.queries("q_latest_by_key")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    // latest_row's map-side combine collapses each partition to ≤1 row
    // per key before the exchange — far below the raw event volume
    assert(b < eventBytes / 5, s"shuffled $b bytes vs events $eventBytes")
  }

  test("the sampling filter shuffles nothing at all") {
    val b = shuffleBytes {
      graft.ops.TextOps
        .deterministicSample(
          Tables.documents(spark, sf01), "doc_id", "lang",
          rates = Map("en" -> 0.3), defaultRate = 1.0)
        .write.format("noop").mode("overwrite").save()
    }
    assert(b == 0L, s"sampling shuffled $b bytes")
  }

  test("jsdMatrix exchanges the vocabulary, never corpus tokens") {
    // exchanges carry (class, term, count/p) rows ∝ classes × DISTINCT
    // terms — the tiny fixture vocabulary — plus the ≤|pairs| result;
    // the exploded corpus token stream (≥ corpus text) must map-side
    // combine away before every shuffle
    val b = shuffleBytes {
      SparkEntry.queries("q_jsd")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    assert(b < corpusTextBytes / 5, s"shuffled $b bytes vs corpus $corpusTextBytes")
  }

  test("transitions exchange is bounded by the type alphabet, not events") {
    val eventBytes: Long = {
      val e = Tables.withTsMicros(Tables.events(spark, sf01))
      e.agg(sum(octet_length(to_json(struct(e.columns.map(col): _*)))))
        .collect()(0).getLong(0)
    }
    val b = shuffleBytes {
      SparkEntry.queries("q_transitions")(spark, sf01)
        .write.format("noop").mode("overwrite").save()
    }
    // one (key, ts, id, type) window exchange — a narrow slice of the
    // event row — then everything is |types|²-bounded; the full event
    // payload (props etc.) must never move
    assert(b < eventBytes / 2, s"shuffled $b bytes vs events $eventBytes")
  }
}
