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
}
