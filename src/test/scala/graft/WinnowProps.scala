package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.TextKernels

/** ScalaCheck equivalence pin for the r20 winnow sliding-minimum
  * rewrite: the monotonic-deque selection must produce EXACTLY the
  * naive per-window rightmost-minimum rescan's output — winnow
  * fingerprints are oracle-matched (DuckDB recomputes them in integer
  * SQL), so any drift in the tie rule breaks three declared queries.
  * The reference below is the pre-r20 O(n·w) loop, kept verbatim in
  * test scope as the semantic yardstick. Repeated-character texts
  * drive the tie-heavy regime (equal hashes in one window), where the
  * `>=`-pop / `<=`-update correspondence is the whole game. */
object WinnowProps extends Properties("Winnow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  /** The pre-r20 selection, verbatim (rightmost min per window via
    * rescan), over an arbitrary hash array. */
  private def naiveMins(hashes: Array[Long], w: Int): Array[Long] = {
    val windows = math.max(hashes.length - w + 1, 1)
    val effW = math.min(w, hashes.length)
    val mins = new Array[Long](windows)
    var start = 0
    while (start < windows) {
      var minIdx = start
      var idx = start + 1
      while (idx < start + effW) {
        if (hashes(idx) <= hashes(minIdx)) minIdx = idx
        idx += 1
      }
      mins(start) = hashes(minIdx)
      start += 1
    }
    java.util.Arrays.sort(mins)
    var m = 0
    var i = 0
    while (i < windows) {
      if (m == 0 || mins(i) != mins(m - 1)) { mins(m) = mins(i); m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(mins, m)
  }

  /** End-to-end naive winnow: rolling hashes exactly as the kernel
    * computes them (same normalize/hash path — via a 1-window call,
    * where selection is the identity), then the naive selection. */
  private def naiveWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val all = TextKernels.winnow(UTF8String.fromString(text), k, 1)
      .toLongArray() // w=1: every k-gram hash, sorted distinct
    // rebuild the UNSORTED hash stream for the naive window walk: the
    // kernel's own k-gram hash per position, recomputed here through
    // the SAME tokenize/normalize path the kernel uses
    val s = String.join(" ",
      TextKernels.tokenize(text.toLowerCase(java.util.Locale.ROOT)): _*)
    if (s.length < k) return Seq.empty
    val mult = 1000003L
    var pow = 1L
    (0 until k - 1).foreach(_ => pow *= mult)
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    (0 until k).foreach(i => h = h * mult + s.charAt(i))
    hashes(0) = TextKernels.fmix64(h)
    var i = k
    while (i < s.length) {
      h = (h - s.charAt(i - k) * pow) * mult + s.charAt(i)
      hashes(i - k + 1) = TextKernels.fmix64(h)
      i += 1
    }
    // sanity: the w=1 call must agree with this hash stream
    assert(all.toSet == hashes.toSet, "hash-stream reconstruction drifted from the kernel")
    naiveMins(hashes, w).toSeq
  }

  private val textGen: Gen[String] = Gen.oneOf(
    // tie-heavy: tiny alphabets produce repeated k-grams → equal hashes
    Gen.listOf(Gen.oneOf('a', 'b', ' ')).map(_.mkString),
    Gen.listOf(Gen.oneOf('a', ' ')).map(_.mkString),
    // general text
    Gen.listOf(Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
      .map(_.mkString))

  property("deque selection == naive rightmost-min rescan over the same hashes") =
    Prop.forAll(textGen, Gen.chooseNum(2, 6), Gen.chooseNum(1, 8)) { (text, k, w) =>
      val got = TextKernels.winnow(UTF8String.fromString(text), k, w)
        .toLongArray().toSeq
      val want = naiveWinnow(text, k, w)
      Prop(got == want) :| s"text='$text' k=$k w=$w got=$got want=$want"
    }

  property("selection over raw hash arrays (ties and monotone runs included)") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 4L)), // tiny range → many ties
      Gen.chooseNum(1, 6)) { (hs, w) =>
      // drive the deque through the kernel by synthesizing nothing: the
      // naive reference alone defines expected sorted-distinct mins;
      // the kernel path is covered by the property above, so here we
      // pin the REFERENCE's own invariants (sorted, distinct, subset)
      val mins = naiveMins(hs.toArray, w)
      Prop(mins.toSeq == mins.toSeq.sorted.distinct && mins.forall(hs.contains)) :|
        s"hs=$hs w=$w mins=${mins.toSeq}"
    }
}
