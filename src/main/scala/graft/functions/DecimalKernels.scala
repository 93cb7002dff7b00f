package graft.functions

import org.apache.spark.sql.types.Decimal

/** Compiled exact double→DECIMAL(38,6) conversion — the per-row stage of
  * [[graft.ops.Relational.exactSum]]'s order-independent decimal
  * accumulation.
  *
  * Why this exists (r21 measurement): Spark's `CAST(double AS DECIMAL)`
  * routes every value through `java.math.BigDecimal.valueOf(double)`,
  * i.e. `Double.toString` + a string parse + `setScale`, three
  * allocations and a formatting pass per row. Four such sums over the
  * sf0.1 fact table measured 0.70 s vs 0.19 s for plain double sums —
  * the cast, not the aggregation, is the cost. The kernel produces the
  * IDENTICAL decimal with integer/FP arithmetic on a guarded fast path
  * and falls back to the exact Cast route (`Decimal(d)`,
  * `changePrecision`) whenever the guard cannot PROVE equality.
  *
  * Equality proof sketch (the fast path): Cast's value is
  * `round_half_up(y, 6)` where `y` is the SHORTEST decimal
  * representation of the double `x` (that is what `Double.toString`
  * yields). `y` re-rounds to `x`, so `|y − X| ≤ ulp(x)/2` for `X` the
  * exact binary value of `x`. The kernel computes `X·10⁶` EXACTLY as a
  * double-double via FMA (`hi = x·10⁶`, `lo = fma(x, 10⁶, −hi)`), takes
  * `m = rint(hi)` (so `hi − m` is exact by Sterbenz) and the residual
  * `r = (hi − m) + lo ≈ X·10⁶ − m` (one rounding, ≤ 2⁻⁵³ absolute).
  * `round_half_up(|v|·10⁶) = m` for EVERY `v` within `g` of `|X|` iff
  * `r ∈ (−0.5 + g, 0.5 − g)`; with `g = 5·10⁵·ulp(|x|) + 10⁻⁹`
  * (the shortest-repr distance bound plus FP slop) the fast result
  * provably equals Cast's. Near a rounding boundary — or once
  * `5·10⁵·ulp(|x|)` approaches 0.5, i.e. `|x| ≳ 4·10⁹` — the guard
  * fails closed and the slow path reproduces Cast bit-for-bit.
  * DecimalKernelProps pins kernel == Cast on random, boundary-crafted,
  * and fixture-derived doubles.
  */
object DecimalKernels {

  /** Fast-path magnitude cap: past ~4e9 the guard band `5e5·ulp(x)`
    * reaches 0.5 and the fast path could never fire; the cap also keeps
    * the unscaled long (`|x|·10⁶ < 4e15`) far from Long overflow. */
  private val FastCap = 4.0e9

  /** Exact drop-in for `CAST(x AS DECIMAL(38,6))` on finite doubles;
    * NULL for NaN/±Infinity (the [[graft.ops.Relational.exactSum]]
    * non-finite guard, folded into the kernel so callers skip the
    * per-row `isnan`/`abs` CASE). Throws on overflow like the ANSI cast
    * (unreachable below the FastCap; only the slow path can see it). */
  def doubleToDecimal6(x: Double): Decimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
    val ax = math.abs(x)
    if (ax < FastCap) {
      val hi = ax * 1e6
      val lo = Math.fma(ax, 1e6, -hi) // exact: ax·10⁶ = hi + lo
      val m = Math.rint(hi)
      val r = (hi - m) + lo
      val g = 5.0e5 * Math.ulp(ax) + 1e-9
      if (r > -0.5 + g && r < 0.5 - g) {
        val n = m.toLong
        return Decimal.createUnsafe(if (x < 0) -n else n, 38, 6)
      }
    }
    slow(x)
  }

  /** Cast's own route (`Decimal(d)` is `BigDecimal.valueOf`, the
    * `Double.toString` path), kept for boundary/huge values. */
  private def slow(x: Double): Decimal = {
    val d = Decimal(x)
    if (!d.changePrecision(38, 6))
      throw new ArithmeticException(
        s"$x cannot be represented as Decimal(38, 6) (exact_decimal6 overflow)")
    d
  }

  /** Fast-path cap for the scale-9 kernel: `5e8·ulp(|x|)` reaches 0.5
    * near 4e6, and the compact unscaled long (`|x|·10⁹ < 4e15`) stays
    * far from overflow below it. */
  private val FastCap9 = 4.0e6

  /** `round_half_even(exact_binary(x), 9)` as DECIMAL(38,9) — the
    * DuckDB double→decimal semantics, exactly (DuckDB rounds the
    * double's EXACT binary value half-to-even; Spark's Cast rounds the
    * SHORTEST decimal representation half-up, and the two disagree on
    * any double sitting on — or within a shortest-repr ulp of — a
    * 9-decimal tie; sf0.1's embeddings contain exactly one such float,
    * 0.1494140625, which surfaced as a one-cell q_embed_centroid
    * divergence — see OPTIMIZATION_r21.md "Inherited state"). The same
    * guarded FMA fast path as [[doubleToDecimal6]] (inside the guard no
    * tie is in play, so every rounding mode agrees and the fast result
    * equals BOTH engines); the slow path rounds `new BigDecimal(x)`
    * (exact binary, NOT valueOf's shortest repr) half-even. NaN/±Inf
    * throw like the ANSI cast on both engines. */
  def doubleToDecimal9HalfEven(x: Double): Decimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"$x cannot be represented as Decimal(38, 9) (decimal9_even non-finite)")
    val ax = math.abs(x)
    if (ax < FastCap9) {
      val hi = ax * 1e9
      val lo = Math.fma(ax, 1e9, -hi) // exact: ax·10⁹ = hi + lo
      val m = Math.rint(hi)
      val r = (hi - m) + lo
      val g = 5.0e8 * Math.ulp(ax) + 1e-9
      if (r > -0.5 + g && r < 0.5 - g) {
        val n = m.toLong
        return Decimal.createUnsafe(if (x < 0) -n else n, 38, 9)
      }
    }
    val d = Decimal(new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_EVEN))
    if (!d.changePrecision(38, 9))
      throw new ArithmeticException(
        s"$x cannot be represented as Decimal(38, 9) (decimal9_even overflow)")
    d
  }
}
