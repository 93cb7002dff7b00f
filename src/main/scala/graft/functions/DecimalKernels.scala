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
}
