package graft

import org.apache.spark.sql.DataFrame

/** Executable plan-quality assertions — the PLANS.md audit as tests, so a
  * regression that silently degrades a physical plan (lost pushdown, a
  * reintroduced sort, a broadcast that stopped firing) fails the build
  * rather than waiting for a benchmark to notice. */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("q_filter_eq pushes the point predicate into the parquet scan") {
    val p = plan("q_filter_eq")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_id,42)"), p)
  }

  test("q_project prunes the scan to exactly the projected columns") {
    val p = plan("q_project")
    assert(p.contains("ReadSchema"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"), read)
  }

  test("changelog materializations hash-aggregate with no sort anywhere") {
    for (q <- Seq("q_latest_by_key", "q_changelog_apply", "q_envelope_apply")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q: $p")
      assert(!p.contains("SortAggregate"), s"$q reintroduced SortAggregate")
      // the final ORDER BY for oracle determinism is the only allowed sort;
      // match every tree rendering ('+- Sort [', ':- Sort [', '*(n) Sort [')
      // but not SortAggregate, asserted separately
      assert("Sort \\[".r.findAllIn(p).size <= 1, s"$q: $p")
    }
  }

  test("q_enrich_join broadcasts the dimension sides at fixture scale") {
    val p = plan("q_enrich_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_topn is a TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_sim_topk never shuffles the corpus: broadcast probe + top-k merge") {
    val p = plan("q_sim_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // no hash-partitioned exchange of corpus rows anywhere in the plan
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q_dedup_docs groups on the md5 fingerprint and hash-aggregates (no sort)") {
    val df: DataFrame = SparkEntry.queries("q_dedup_docs")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("md5("), p) // the 16-byte grouping key
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), "min_by-style SortAggregate reintroduced: " + p)
    // no exchange partitions on the raw text column
    p.linesIterator.filter(_.contains("hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), l)
    }
  }

  test("q_neardup_simhash computes signatures as a pure projection (no explode, no tally agg)") {
    val p = plan("q_neardup_simhash")
    assert(p.contains("simhash64"), p)
    assert(!p.contains("Generate explode(split"), p)
  }

  test("q_curate: one kernel pass, fingerprint-keyed hash aggregate, no text shuffle") {
    val p = plan("q_curate")
    // the quality gates read the single char_class_counts kernel call
    assert(p.contains("char_class_counts"), p)
    // dedup groups on the md5 fingerprint, hash-aggregated
    assert(p.contains("md5(") && p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
    // nothing exchanges on the raw document text
    p.linesIterator.filter(_.contains("hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), l)
    }
  }

  test("q_neardup_jaccard joins prefixes with the size filter, never the raw text") {
    val p = plan("q_neardup_jaccard")
    // the size-compatibility predicate rides IN the join condition —
    // size-incompatible collisions die before any array is touched
    assert(p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("n1") && l.contains("n2")), p)
    // candidate generation shuffles shingles/ids only — no exchange
    // carries the document text column
    p.linesIterator.filter(_.contains("hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), l)
    }
  }

  test("q_split assigns splits as a pure projection — no exchange before the audit agg") {
    // the split column must be a codegen'd CASE over the md5 hash, never
    // a repartition; the only exchanges belong to the (split, lang)
    // audit aggregate and its oracle sort
    val p = plan("q_split")
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.size <= 1, s"unexpected exchanges:\n${exchanges.mkString("\n")}")
    exchanges.foreach(l => assert(!l.contains("doc_id#"), l))
  }

  test("q_pack shuffles (id, shard, count) only — the text never moves") {
    val p = plan("q_pack")
    p.linesIterator.filter(_.contains("hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), l)
    }
  }

  test("q_knn_label classifies via the nearest_centroid kernel, no corpus join") {
    val p = plan("q_knn_label")
    assert(p.contains("nearest_centroid"), p)
    // assignment is a projection: no join anywhere in the classify plan
    assert(!p.contains("Join"), p)
  }

  test("q_bigrams builds windows with the compiled kernel and takes top-k without a global sort") {
    val p = plan("q_bigrams")
    assert(p.contains("word_ngrams"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("hash-ordered prefix candidates: one reused prefix exchange, never text") {
    // r22 shape: the per-row array pipeline (shingles → hash → sort →
    // slice → explode) feeds a merge-hinted self-join whose two sides'
    // exchanges are canonically equal — the executed plan must carry the
    // prefix rows through ONE exchange (the other side a ReusedExchange,
    // so the kernel pipeline runs once) and no exchange anywhere may
    // carry the text column. A window creeping back in still fails.
    val cands = graft.ops.NearDup.prefixFilterCandidates(
      Tables.documents(spark, sf001), "doc_id", "text", 3, 0.8, "hash")
    cands.collect()
    // the adaptive plan prints "== Initial Plan ==" after the final
    // plan — assert on the FINAL section only (the initial plan always
    // shows both sides pre-reuse)
    val p = cands.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"hash order must not use a window:\n$p")
    val exchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      .toSeq
    assert(exchanges.forall(l => !l.contains("text#")),
      s"an exchange carries text:\n${exchanges.mkString("\n")}")
    // exactly one NON-reused exchange of the prefix-hash rows: the
    // second side must be a ReusedExchange (one kernel evaluation)
    val prefixExchanges = exchanges.filter(_.contains("(h#"))
    assert(prefixExchanges.size == 1,
      s"expected one prefix exchange + a reuse, got:\n${exchanges.mkString("\n")}")
    assert(p.contains("ReusedExchange"),
      s"self-join must reuse the prefix exchange:\n$p")
  }

  test("q_lm_score scores through the unigram_nll kernel with zero corpus shuffle") {
    val p = plan("q_lm_score")
    // the vocab build runs as its own bounded job at construction; the
    // scoring plan itself is a pure kernel projection + determinism sort
    assert(p.contains("unigram_nll"), p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q_funnel secondary-sorts instead of materializing per-user arrays") {
    val p = plan("q_funnel")
    assert(!p.toLowerCase.contains("collect_list"), p)
    // one corpus-sized exchange (by user) + the steps-sized histogram agg
    assert("hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q_bm25 never shuffles the corpus: broadcast stats + TakeOrdered") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the one-row stats aggregate is the only exchange; corpus rows are
    // never hash-partitioned
    assert(!p.contains("hashpartitioning"), p)
  }

  test("profile plans split — no multi-distinct Expand on any profile flavor") {
    val li = Tables.lineitem(spark, sf001)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    val exact = graft.ops.Relational.profile(li, cols)
      .queryExecution.executedPlan.toString
    val approx = graft.ops.Relational.profileApprox(li, cols)
      .queryExecution.executedPlan.toString
    val checked = graft.ops.Relational.profileApproxChecked(li, cols)
      .queryExecution.executedPlan.toString
    // r21: the exact multi-distinct's Expand (row volume ×(|cols|+1)
    // through one wide-keyed aggregate) is gone — each column's exact
    // distinct count is its own narrow two-level aggregate, so no
    // profile flavor expands rows at all
    assert(!exact.contains("Expand"), exact)
    // one distinct exchange per column, plus nothing else keyed on data
    assert(exact.linesIterator.count(_.contains("Exchange hashpartitioning")) == cols.size, exact)
    // the sketch keeps the scan flat no matter how many columns profile
    assert(!approx.contains("Expand"), approx)
    assert(!checked.contains("Expand"), checked)
    // the checked harness computes the basic stats ONCE: exactly one
    // zero-key aggregate carries the decimal sums (its partial shows
    // the exact_decimal6 kernel), not two
    assert(checked.linesIterator.count(l =>
      l.contains("partial_sum") && l.contains("exact_decimal6")) == 1, checked)
  }

  test("q_bm25_indexed reads only the query terms' posting partitions") {
    val p = plan("q_bm25_indexed")
    // partition pruning on the bucket directory key reaches the scan
    assert(p.contains("PartitionFilters"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("bucket")), p)
  }

  test("q_scd2 versions with one per-key window — no changelog self-join") {
    val p = plan("q_scd2")
    // the naive interval build joins the changelog against itself; the
    // lead-window build must not contain any join at all
    assert(!p.contains("Join"), p)
    assert(p.contains("WindowExec") || p.contains("Window"), p)
  }

  test("q_chi2 and q_psi stay cardinality-bound: every join is broadcast") {
    for (q <- Seq("q_chi2", "q_psi")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q grew a shuffled join: $p")
      assert(p.contains("BroadcastExchange"), s"$q: $p")
    }
  }

  test("q_transitions broadcasts the per-prev totals back onto the count table") {
    val p = plan("q_transitions")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_state_at and q_disorder stay join-free one-window plans") {
    for (q <- Seq("q_state_at", "q_disorder")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: $p")
      assert(p.contains("Window"), s"$q: $p")
    }
  }

  test("q_kanon is one hash aggregate — no join, no window, no extra sort") {
    val p = plan("q_kanon")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // the ORDER BY for oracle determinism is the only sort
    assert("Sort \\[".r.findAllIn(p).size <= 1, p)
  }

  test("q_neardup_edit candidates come from equi-joins, never a cross product") {
    val p = plan("q_neardup_edit")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"), p)
  }

  test("q_rfm collapses events before any window touches the user axis") {
    val p = plan("q_rfm")
    // the event stream reduces in a hash aggregate (map-side combined);
    // the ntile windows then run over per-user rows only — no event-level
    // sort anywhere but those user-axis windows and the final ORDER BY
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }
}
