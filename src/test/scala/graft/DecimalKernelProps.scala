package graft

import org.apache.spark.sql.types.Decimal
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.DecimalKernels

/** ScalaCheck equivalence pin for the r21 exact_decimal6 kernel:
  * [[DecimalKernels.doubleToDecimal6]] must produce EXACTLY what
  * Spark's `CAST(double AS DECIMAL(38,6))` produces — exactSum feeds
  * every declared decimal-accumulated sum through it, and the DuckDB
  * oracles compute the literal CAST, so any divergence breaks dozens
  * of hash-matched queries. The reference below is Cast's own code
  * path (`Decimal(d)` = `BigDecimal.valueOf` = the `Double.toString`
  * route, then `changePrecision(38, 6)` HALF_UP), kept verbatim as the
  * semantic yardstick. Generators deliberately hammer the fast path's
  * guard: values a hair's breadth from `k + 0.5` rounding boundaries
  * at the 6th decimal, every magnitude regime across the ~4e9 fast-cap
  * (including the band just above it, slow-path-only), subnormals,
  * negative zero, and the product shapes the pricing query derives. */
object DecimalKernelProps extends Properties("DecimalKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  /** Spark Cast's double→decimal(38,6) route, verbatim. */
  private def castRef(x: Double): Decimal = {
    val d = Decimal(x)
    if (!d.changePrecision(38, 6))
      throw new ArithmeticException(s"$x overflows Decimal(38, 6)")
    d
  }

  private def agree(x: Double): Prop = {
    val k = DecimalKernels.doubleToDecimal6(x)
    val r = castRef(x)
    Prop(k == r && k.toJavaBigDecimal.compareTo(r.toJavaBigDecimal) == 0) :|
      s"x=$x kernel=$k cast=$r"
  }

  // ----- generators ---------------------------------------------------

  /** Log-uniform magnitudes across the whole fast-path range and past
    * the cap into slow-path territory (±1e-320 .. ±1e14). */
  private val logUniform: Gen[Double] = for {
    exp <- Gen.chooseNum(-320.0, 14.0)
    mant <- Gen.chooseNum(1.0, 9.999999)
    neg <- Gen.oneOf(true, false)
  } yield (if (neg) -1 else 1) * mant * math.pow(10, exp)

  /** Values engineered to sit AT or within a few ulps of a `k + 0.5`
    * boundary at the 6th decimal — the only place fast and slow can
    * disagree, so the guard must fail closed there. */
  private val nearBoundary: Gen[Double] = for {
    k <- Gen.chooseNum(0L, 4000000000000000L) // boundaries across the fast range
    ulps <- Gen.chooseNum(-3, 3)
    neg <- Gen.oneOf(true, false)
  } yield {
    val b = (k + 0.5) / 1e6
    val nudged = (0 until math.abs(ulps)).foldLeft(b)((v, _) =>
      if (ulps >= 0) Math.nextUp(v) else Math.nextDown(v))
    if (neg) -nudged else nudged
  }

  /** "Nice" ≤6-decimal values (the fixture's prices/rates) and their
    * double-arithmetic products (the pricing query's derived measures). */
  private val fixtureShaped: Gen[Double] = for {
    cents <- Gen.chooseNum(-11000000L, 11000000L)
    rate <- Gen.chooseNum(0, 10)
    kind <- Gen.oneOf(0, 1, 2)
  } yield kind match {
    case 0 => cents / 100.0
    case 1 => rate / 100.0
    case 2 => (cents / 100.0) * (1.0 - rate / 100.0) * (1.0 + rate / 100.0)
  }

  /** Uniform random bit patterns (filtered to finite) — no structure
    * at all. */
  private val rawBits: Gen[Double] = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    .map(java.lang.Double.longBitsToDouble)
    .suchThat(d => !d.isNaN && !d.isInfinite && math.abs(d) < 1e31)

  property("logUniform magnitudes") = Prop.forAll(logUniform)(agree)
  property("rounding boundaries") = Prop.forAll(nearBoundary)(agree)
  property("fixture-shaped values") = Prop.forAll(fixtureShaped)(agree)
  property("raw finite bit patterns") = Prop.forAll(rawBits)(agree)

  property("edge cases") = Prop.all(
    Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      4.0e9, Math.nextUp(4.0e9), -4.0e9, 1e-7, 5e-7, -5e-7, 1.5e-6,
      0.0000005, 0.0000015, 123456.1234565, 9.0e12, -9.0e12)
      .map(agree): _*)

  property("non-finite → NULL") = Prop(
    DecimalKernels.doubleToDecimal6(Double.NaN) == null &&
      DecimalKernels.doubleToDecimal6(Double.PositiveInfinity) == null &&
      DecimalKernels.doubleToDecimal6(Double.NegativeInfinity) == null)

  // ----- decimal9_even: the DuckDB double→decimal semantics -----------

  /** Exact-binary half-even at scale 9 — the independently-written
    * reference (java BigDecimal over the exact binary value). */
  private def evenRef(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_EVEN)

  private def agree9(x: Double): Prop = {
    val k = DecimalKernels.doubleToDecimal9HalfEven(x)
    Prop(k.toJavaBigDecimal.compareTo(evenRef(x)) == 0) :|
      s"x=$x kernel=$k ref=${evenRef(x)}"
  }

  /** Doubles engineered AT or near `k + 0.5` ties at the 9th decimal —
    * where half-even and Cast's half-up(shortest-repr) genuinely
    * differ; the kernel must follow the exact-binary half-even side. */
  private val nearBoundary9: Gen[Double] = for {
    k <- Gen.chooseNum(0L, 4000000000000000L)
    ulps <- Gen.chooseNum(-3, 3)
    neg <- Gen.oneOf(true, false)
  } yield {
    val b = (k + 0.5) / 1e9
    val nudged = (0 until math.abs(ulps)).foldLeft(b)((v, _) =>
      if (ulps >= 0) Math.nextUp(v) else Math.nextDown(v))
    if (neg) -nudged else nudged
  }

  /** Short-mantissa floats (widened) — the population that lands
    * exactly on decimal ties, incl. the sf0.1 fixture value. */
  private val floatShaped9: Gen[Double] = for {
    bits <- Gen.chooseNum(0, (1 << 24) - 1)
    exp <- Gen.chooseNum(-24, 10)
  } yield Math.scalb(bits.toDouble, exp)

  property("decimal9_even: logUniform magnitudes") =
    Prop.forAll(logUniform.suchThat(d => math.abs(d) < 1e28))(agree9)
  property("decimal9_even: rounding boundaries") = Prop.forAll(nearBoundary9)(agree9)
  property("decimal9_even: float-shaped values") =
    Prop.forAll(floatShaped9.suchThat(d => math.abs(d) < 1e28))(agree9)

  property("decimal9_even: the sf0.1 tie value rounds half-even, not half-up") = {
    val tie = 0.1494140625 // exactly k + 0.5 at the 9th decimal
    val k = DecimalKernels.doubleToDecimal9HalfEven(tie)
    Prop(k.toJavaBigDecimal.compareTo(new java.math.BigDecimal("0.149414062")) == 0) :|
      s"got $k" // Cast/half-up would give 0.149414063
  }
}
