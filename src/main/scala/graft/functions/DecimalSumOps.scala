package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegralDivide, MakeDecimal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact decimal-sum hot path: convert each double to the UNSCALED int64
  * of its decimal rendering once, aggregate plain longs, rebuild one
  * decimal per group.
  *
  * Why: Spark's `sum` over a `DecimalType` beyond 18 digits of precision
  * leaves the compact-long representation — every update allocates
  * through `Decimal`/`CheckOverflow`, and the aggregation buffer row
  * stores a variable-length value. The r17 probe measured TPC-H Q1's
  * three DECIMAL(38,x) sums at 7.8 s over 6.0M rows where the identical
  * plan with double sums runs 0.9 s — an ~8× tax that is pure
  * accumulation machinery, not scan (lowering the cast to DECIMAL(18,4)
  * does not help: the SUM buffer is precision+10, still past the compact
  * threshold). Summing the unscaled int64 keeps the whole aggregate in
  * whole-stage codegen over fixed-width longs.
  *
  * Faithfulness: [[DecimalUnscaled]] reproduces Spark's
  * `cast(double AS DECIMAL(38,s))` bit-for-bit —
  * `java.math.BigDecimal.valueOf(x)` (the shortest decimal rendering of
  * the double, exactly what scala's `BigDecimal(d)` inside Catalyst's
  * Cast wraps) `.setScale(s, HALF_UP)`, then the unscaled long. The
  * per-group [[MakeDecimal]] then yields the identical DECIMAL(38,s) the
  * decimal-sum plan would, so the `cast("double")` output and the DuckDB
  * oracle (`SUM(CAST(x AS DECIMAL(38,s)))`) are unchanged.
  * DecimalSumSpec pins sum-level equality on adversarial values (ties at
  * the half digit, negatives, 15-digit products, nulls).
  *
  * Domain, stated instead of silently wrong:
  *  - per VALUE: |x·10^s| must fit int64 (`longValueExact` raises
  *    ArithmeticException past ±9.2·10^(18−s) — a cast-to-decimal(38,s)
  *    would survive there, so the raise names the fix: use the decimal
  *    path for such magnitudes);
  *  - per GROUP: past 2⁶³ the int64 accumulator throws under ANSI (the
  *    Spark 4 default) and wraps SILENTLY in non-ANSI sessions, so
  *    [[DecimalSumOps.dsum_exact]] accumulates the exact hi/lo SPLIT of
  *    the unscaled value (r20 — ONE code path, four aggregates: the r19
  *    shape ran a narrow single-long fast value alongside the split
  *    fallback, six aggregates whose premium the in-band sf1.0 A/B
  *    measured real; Σu = Σhi·10⁹ + Σlo reassembles the identical
  *    value), giving a `Σ|unscaled| < ~9·10²⁷ ∧ count < 9·10⁹` group
  *    domain — 10⁹× wider than one long — with a NAMED raise past it:
  *    the star-CC overflow lesson (r16): at-scale arithmetic needs an
  *    explicit domain fence, not a mode assumption.
  */
case class DecimalUnscaled(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 0 && scale <= 18, s"scale out of [0, 18]: $scale")

  // call sites guarantee a double input (explicit cast in dec_unscaled);
  // no ImplicitCastInputTypes — AbstractDataType is private[sql]
  override def dataType: DataType = LongType
  override def prettyName: String = "decimal_unscaled"

  override protected def nullSafeEval(x: Any): Any =
    java.math.BigDecimal.valueOf(x.asInstanceOf[Double])
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = java.math.BigDecimal.valueOf($x)
         |  .setScale($scale, java.math.RoundingMode.HALF_UP)
         |  .unscaledValue().longValueExact();""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DecimalUnscaled =
    copy(child = newChild)
}

/** One half of the SPLIT unscaled rendering — `quotient = true` yields
  * `unscaled quot 10⁹`, `false` yields `unscaled rem 10⁹` (BigInteger
  * divideAndRemainder: truncated toward zero, remainder signed with the
  * dividend, so `u = hi·10⁹ + lo` exactly). The split happens on the
  * BigInteger BEFORE any int64 narrowing, so the per-value domain is
  * |x| < 9.2·10^(27−scale) (e.g. |x| < 9.2·10⁹ at scale 18) — wide
  * enough for log-probability and similarity sums where the single-long
  * [[DecimalUnscaled]] fence (|x| < 9.2 at scale 18) is too tight.
  */
case class DecimalUnscaledSplit(child: Expression, scale: Int, quotient: Boolean)
    extends UnaryExpression {

  require(scale >= 9 && scale <= 18, s"scale out of [9, 18]: $scale")

  override def dataType: DataType = LongType
  override def prettyName: String =
    if (quotient) "decimal_unscaled_hi" else "decimal_unscaled_lo"

  override protected def nullSafeEval(x: Any): Any = {
    val qr = java.math.BigDecimal.valueOf(x.asInstanceOf[Double])
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue()
      .divideAndRemainder(java.math.BigInteger.valueOf(1000000000L))
    if (quotient) qr(0).longValueExact() else qr(1).longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b9 = ctx.addReferenceObj("b9", java.math.BigInteger.valueOf(1000000000L),
      "java.math.BigInteger")
    val pick = if (quotient) "[0].longValueExact()" else "[1].longValue()"
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = java.math.BigDecimal.valueOf($x)
         |  .setScale($scale, java.math.RoundingMode.HALF_UP)
         |  .unscaledValue().divideAndRemainder($b9)$pick;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DecimalUnscaledSplit =
    copy(child = newChild)
}

object DecimalSumOps {

  /** Unscaled int64 of `cast(c AS DECIMAL(38, scale))` — see
    * [[DecimalUnscaled]] for the faithfulness and domain contract. */
  def dec_unscaled(c: Column, scale: Int): Column =
    GraftBridge.column(
      DecimalUnscaled(GraftBridge.expression(c.cast("double")), scale))

  /** Drop-in for `sum(c.cast(DECIMAL(38, scale))).cast("double")` on the
    * int64 fast path: identical values (DecimalSumSpec), ~whole-stage
    * codegen cost, and a per-group overflow fence that RAISES where the
    * long accumulator could have wrapped silently. Usable in `agg` lists
    * (compound aggregate expression) and over windows via [[dec_unscaled]]
    * + [[make_dec]] directly.
    */
  def dsum_exact(c: Column, scale: Int): Column = {
    val u = dec_unscaled(c, scale)
    // ONE code path, FOUR aggregates (r20 — the r19 shape ran the
    // narrow single-long fast value AND the split fallback side by
    // side: six aggregates, two fences; the in-band sf1.0 A/B measured
    // the decimal-agg premium real on e_agg_groupby, so the value now
    // DERIVES from the split sums alone). hi/lo = u divRem 10⁹
    // in pure long arithmetic on the SAME unscaled value (IntegralDivide
    // truncates toward zero and % keeps the dividend's sign — the
    // DecimalUnscaledSplit contract, so u = hi·10⁹ + lo exactly); both
    // halves sum as longs and Σu reassembles EXACTLY in decimal as
    // make_dec(Σhi, s)·10⁹ + make_dec(Σlo, s) — precision 19 operands
    // keep the multiply at 30 and the add at 31, inside DECIMAL(38) —
    // the identical per-group value the single-accumulator form
    // produced (byte-pinned by DecimalSumSpec).
    // Domain: Σ|hi| < 9·10¹⁸ (i.e. Σ|unscaled| < ~9·10²⁷, a 10⁹×
    // wider group bound than one long) and count < 9·10⁹ (|Σlo| ≤
    // count·10⁹; the Σ|hi| guard is a double sum whose ≤ n·ε relative
    // error is dwarfed by the 2.4% headroom between 9.0e18 and 2⁶³);
    // only past BOTH does the named raise remain. The long accumulators
    // ride try_sum so a discarded branch can never ANSI-throw before
    // the fence picks the branch (plain sum would, mid-aggregation).
    val hi = GraftBridge.column(IntegralDivide(
      GraftBridge.expression(u), GraftBridge.expression(lit(1000000000L))))
    val lo = u % lit(1000000000L)
    val safeSplit = (sum(abs(hi.cast("double"))) < lit(9.0e18)) &&
      (count(u) < lit(9000000000L))
    val splitDec =
      make_dec(try_sum(hi), scale, 19) *
        lit(java.math.BigDecimal.valueOf(1000000000L)) +
        make_dec(try_sum(lo), scale, 19)
    when(coalesce(safeSplit, lit(true)), splitDec.cast("double"))
      .otherwise(raise_error(lit(
        "dsum_exact: group magnitude exceeds even the split int64 " +
          "accumulators (sum|unscaled| >= 9e27 or count >= 9e9) - use the " +
          "decimal-sum path for this data")).cast("double"))
  }

  /** DECIMAL(precision, scale) from an unscaled int64 column (Catalyst
    * MakeDecimal — the inverse of [[dec_unscaled]] at the aggregate).
    * `precision` matters when the result feeds decimal ARITHMETIC:
    * Spark's add/divide widen by both operands' integral digits and,
    * past precision 38, resolve the overflow by REDUCING the result
    * scale (allowPrecisionLoss) — silent rounding. An int64 unscaled
    * needs at most 19 digits, so tight callers pass 19 and stay exact.
    */
  def make_dec(unscaled: Column, scale: Int, precision: Int = 38): Column =
    GraftBridge.column(
      MakeDecimal(GraftBridge.expression(unscaled), precision, scale,
        nullOnOverflow = false))

  /** [[dsum_exact]] for HIGH scales, where one int64 is too narrow (at
    * scale 18, |value| < 9.2 already fills the unscaled range — a single
    * long can neither hold a log-probability's unscaled value nor a
    * 20k-row group's sum): [[DecimalUnscaledSplit]] renders each value
    * as the exact pair `(hi, lo) = unscaled divRem 10⁹` on the
    * BigInteger BEFORE narrowing, both halves sum as plain longs, and
    * ONE `MakeDecimal(Σhi, scale−9) + MakeDecimal(Σlo, scale)` per group
    * recombines to exactly the DECIMAL(38, scale) total the decimal-sum
    * plan would produce. Domain: per value |x| < 9.2·10^(27−scale); per
    * group `Σ|hi| < 9·10^18` and `count < 9·10^9` (the |lo| <
    * 10⁹ bound) — both fenced, raising instead of wrapping.
    */
  def dsum_exact_split(c: Column, scale: Int): Column = {
    val d = c.cast("double")
    def half(quotient: Boolean): Column = GraftBridge.column(
      DecimalUnscaledSplit(GraftBridge.expression(d), scale, quotient))
    val hi = half(quotient = true)
    val lo = half(quotient = false)
    // Σ|hi| is the tight hi-accumulator bound (the dsum_exact fence
    // argument); the count bound keeps |Σlo| < 9e18 since each |lo| < 10⁹
    val safe = (sum(abs(hi.cast("double"))) < lit(9.0e18)) &&
      (count(lo) < lit(9000000000L))
    // precision 19 (an int64's digit bound) keeps the decimal ADD at
    // precision max(10, scale-18)+scale+1 ≤ 29 — exact; at the default
    // 38 the add would overflow and Spark would RESOLVE it by reducing
    // the result scale (silent rounding, caught by DecimalSumSpec)
    val dec = make_dec(sum(hi), scale - 9, 19) + make_dec(sum(lo), scale, 19)
    when(coalesce(safe, lit(true)), dec.cast("double"))
      .otherwise(raise_error(lit(
        "dsum_exact_split: group magnitude may overflow the split int64 " +
          "accumulators - use the decimal-sum path for this data")).cast("double"))
  }

  /** [[dsum_exact]] over a window: the same int64 fast path and the same
    * per-frame overflow fence, with the guard aggregates riding the SAME
    * window spec (no extra shuffle — one Window operator carries all
    * three). */
  def dsum_exact_over(c: Column, scale: Int,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val u = dec_unscaled(c, scale)
    val safe = sum(abs(u.cast("double"))).over(w) < lit(9.0e18)
    when(coalesce(safe, lit(true)), make_dec(sum(u).over(w), scale).cast("double"))
      .otherwise(raise_error(lit(
        "dsum_exact_over: frame magnitude may overflow the int64 " +
          "accumulator - use the decimal-sum path for this data")).cast("double"))
  }
}
