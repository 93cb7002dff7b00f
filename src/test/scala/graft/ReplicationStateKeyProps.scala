package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.streaming.ReplicationPipeline

/** ScalaCheck properties for the replication facade's changelog
  * state-key encoding — the seam every composite-key guarantee rests
  * on: two distinct key tuples of the SAME arity must never share a
  * state row (a collision silently merges two database rows), and the
  * single-key form must stay byte-identical to the pre-composite
  * pipeline's `String.valueOf` (the checkpoint-compatibility
  * contract). Pure driver-side string function — generous case count. */
object ReplicationStateKeyProps extends Properties("ReplicationStateKey") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // components drawn to maximize collision pressure on a naive join:
  // empty strings, the encoding's own separators (':' ';'), digit
  // prefixes that mimic length prefixes, and each other's concatenations
  private val component: Gen[String] = Gen.oneOf(
    Gen.oneOf("", ":", ";", "1:", "1:a", "a;b", "2:ab;1:c", "10", "0:"),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.listOfN(3, Gen.oneOf(':', ';', 'a', '1')).map(_.mkString))

  private def tuple(n: Int): Gen[List[String]] = Gen.listOfN(n, component)

  property("fixed-arity injectivity: stateKey(a) == stateKey(b) iff a == b") =
    Prop.forAll(Gen.chooseNum(2, 4).flatMap(n => Gen.zip(tuple(n), tuple(n)))) {
      case (a, b) =>
        (ReplicationPipeline.stateKey(a) == ReplicationPipeline.stateKey(b)) == (a == b)
    }

  property("single-key form is the bare component (pre-composite checkpoint compatibility)") =
    Prop.forAll(component) { s =>
      ReplicationPipeline.stateKey(Seq(s)) == s
    }

  // a deliberately adversarial directed pair under the generator's roof:
  // the concatenation-with-separator collision a naive mkString(";")
  // encoding would have
  property("the naive-join collision pair encodes distinctly") = Prop {
    ReplicationPipeline.stateKey(Seq("a;b", "c")) !=
      ReplicationPipeline.stateKey(Seq("a", "b;c"))
  }

  // the r20 scalar-key gate's admissibility PREMISE, pinned: for every
  // whitelisted key type, the external row value stringifies by VALUE —
  // two independently constructed equal instances (distinct identities
  // for the reference types, so an identity toString would fail here
  // the way it fails for Array[Byte]) produce the same state-key
  // component. Decimals are compared at the SAME scale, which is what
  // a DecimalType(p, s) column guarantees for every row.
  property("whitelisted scalar external values stringify by value, not identity") =
    Prop.forAll(
      Gen.oneOf[Long => (Any, Any)](
        (v: Long) => (java.lang.Integer.valueOf(v.toInt), java.lang.Integer.valueOf(v.toInt)),
        (v: Long) => (java.lang.Long.valueOf(v), java.lang.Long.valueOf(v)),
        (v: Long) => (java.lang.Boolean.valueOf(v % 2 == 0), java.lang.Boolean.valueOf(v % 2 == 0)),
        (v: Long) => (java.lang.Byte.valueOf(v.toByte), java.lang.Byte.valueOf(v.toByte)),
        (v: Long) => (java.lang.Short.valueOf(v.toShort), java.lang.Short.valueOf(v.toShort)),
        // Float/Double are NOT generated: they left the whitelist in r20
        // (valueOf is value-based per instance, but SQL grouping
        // normalizes -0.0 == 0.0 / NaN == NaN while valueOf does not,
        // so the gate rejects them for grouping-semantics mismatch)
        (v: Long) => (new String(v.toString.toCharArray), new String(v.toString.toCharArray)),
        (v: Long) => (java.math.BigDecimal.valueOf(v, 2), java.math.BigDecimal.valueOf(v, 2)),
        (v: Long) => (new java.sql.Date(math.abs(v) % 8000000000000L),
          new java.sql.Date(math.abs(v) % 8000000000000L)),
        (v: Long) => (new java.sql.Timestamp(math.abs(v) % 8000000000000L),
          new java.sql.Timestamp(math.abs(v) % 8000000000000L)),
        (v: Long) => {
          val ndt = java.time.LocalDateTime.ofEpochSecond(
            math.abs(v) % 8000000000L, (math.abs(v) % 1000000).toInt * 1000,
            java.time.ZoneOffset.UTC)
          // LocalDateTime is immutable-cached-free: two independent
          // lookups of the same instant are equal values
          (ndt, java.time.LocalDateTime.ofEpochSecond(
            math.abs(v) % 8000000000L, (math.abs(v) % 1000000).toInt * 1000,
            java.time.ZoneOffset.UTC))
        }),
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) { (mk, v) =>
      val (a, b) = mk(v)
      // the meta-assertion (the pair really has distinct identities, so
      // identity toString WOULD differ) only holds for types that never
      // cache instances: boxed primitives cache small values and
      // BigDecimal.valueOf caches zeros at small scales, so restrict it
      // to the fresh-constructed reference types
      val freshRef = a.isInstanceOf[String] ||
        a.isInstanceOf[java.sql.Date] || a.isInstanceOf[java.sql.Timestamp]
      Prop(!freshRef || (a.asInstanceOf[AnyRef] ne b.asInstanceOf[AnyRef])) :|
        s"fresh reference-typed pair must be distinct identities ($a)" &&
        Prop(String.valueOf(a) == String.valueOf(b)) :|
        s"value-based stringify violated: $a vs $b"
    }

  // the counterexample the gate rejects, stated next to the premise:
  // equal byte arrays do NOT stringify equally — this is exactly why
  // BinaryType is not on the whitelist
  property("equal byte arrays stringify by identity — the rejected shape") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      val a = bs.toArray
      val b = bs.toArray
      String.valueOf(a) != String.valueOf(b)
    }
}
