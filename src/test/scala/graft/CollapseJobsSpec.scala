package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the job-accounting shape of `collapseNearDups`: each propagation
  * round materializes its plan EXACTLY ONCE (the lazy checkpoint is
  * realized by the round's convergence count), so scheduler jobs grow
  * LINEARLY in rounds with a small AQE constant (~6 jobs per round — one
  * per query stage), never quadratically. The quadratic failure mode is
  * real: drop a round's checkpoint and every round re-derives all prior
  * rounds' lineage. This spec makes the property regression-checked. */
class CollapseJobsSpec extends SparkTestBase {

  private def countJobs(body: => Unit): Int = {
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      body
      org.apache.spark.GraftSparkTestHooks.flushListeners(sc)
      jobs.get
    } finally sc.removeSparkListener(listener)
  }

  test("collapseNearDups jobs grow linearly in propagation rounds, not quadratically") {
    import spark.implicits._
    val docs = (0L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a chain 0-1-2-…-n propagates the min label one hop per round:
    // rounds = chain length (the worst case for a given component size)
    def chain(n: Int) = (1L until n).map(i => (i, i + 1)).toDF("id1", "id2")

    def jobsFor(n: Int): Int = {
      // warm once (codegen, broadcast-threshold probing) so constants
      // don't differ between the two measured runs
      graft.ops.NearDup.collapseNearDups(docs, "doc_id", chain(n)).count()
      countJobs(graft.ops.NearDup.collapseNearDups(docs, "doc_id", chain(n)).count())
    }

    val j15 = jobsFor(15) // 15 rounds
    val j30 = jobsFor(30) // 30 rounds
    // linear: doubling rounds ~doubles jobs. Quadratic lineage replay
    // would push the ratio toward 4; assert the midpoint stays far away.
    val ratio = j30.toDouble / j15
    assert(ratio < 3.0, s"jobs grew super-linearly with rounds: $j15 -> $j30 (${ratio}x)")
    // and the per-round constant stays modest (AQE submits one job per
    // query stage; ~6/round today, 10 allows planner drift but catches
    // any per-round re-materialization)
    assert(j30 <= 30 * 10,
      s"more than 10 jobs per round ($j30 for 30 rounds) — a round is materializing twice")
  }
}
