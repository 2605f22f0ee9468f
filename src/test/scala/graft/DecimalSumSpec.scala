package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DecimalSumOps._

/** Parity pin for the unscaled-int64 decimal-sum fast path
  * (functions.DecimalSumOps): `dsum_exact(c, s)` must equal
  * `sum(c.cast(DECIMAL(38, s))).cast("double")` EXACTLY — same decimal
  * rendering (BigDecimal.valueOf = shortest rep), same HALF_UP at the
  * scale digit, same decimal→double final rounding — on adversarial
  * values: ties exactly at the half digit (where HALF_EVEN or
  * binary-product rounding would diverge), negatives, 15-digit double
  * products, nulls, and seeded random magnitudes. Plus the two domain
  * fences: the per-value int64-range raise and the per-group
  * wraparound guard.
  */
class DecimalSumSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def adversarial: Seq[java.lang.Double] = {
    val rnd = new scala.util.Random(0xd5c1)
    val prices = Seq.fill(400)((rnd.nextInt(10000000) + 1) / 100.0) // 2-dp "prices"
    val products = prices.map(p => p * (1.0 - rnd.nextInt(11) / 100.0)) // full-precision doubles
    val ties = Seq(1.00005, -1.00005, 0.00005, -0.00005, 2.5, -2.5,
      0.000050000000000001, 123.456750, -99.99995)
    val wide = Seq.fill(200)(rnd.nextDouble() * math.pow(10, rnd.nextInt(12) - 3) *
      (if (rnd.nextBoolean()) 1 else -1))
    val nulls = Seq.fill(17)(null.asInstanceOf[java.lang.Double])
    rnd.shuffle(prices.map(Double.box) ++ products.map(Double.box) ++
      ties.map(Double.box) ++ wide.map(Double.box) ++ nulls)
  }

  private def frame = adversarial.zipWithIndex
    .map { case (v, i) => (i % 5, Option(v).map(_.doubleValue)) }
    .toDF("g", "v")

  test("dsum_exact equals the decimal sum on adversarial values, scales 4 and 6") {
    for (s <- Seq(4, 6)) {
      val dec = DecimalType(38, s)
      val got = frame.groupBy("g")
        .agg(dsum_exact(col("v"), s).as("x")).orderBy("g").collect()
        .map(r => (r.getInt(0), r.get(1)))
      val want = frame.groupBy("g")
        .agg(sum(col("v").cast(dec)).cast("double").as("x")).orderBy("g").collect()
        .map(r => (r.getInt(0), r.get(1)))
      assert(got.toSeq == want.toSeq, s"scale $s")
    }
  }

  test("dsum_exact_split equals the scale-18 decimal sum on log-magnitude values and big groups") {
    // the high-scale regime the single-long kernel cannot touch: |x| up
    // to ~25 (log-probabilities: unscaled 2.5e19 > 2^63 per VALUE) and a
    // 20k-row group (sum far past 2^63 even for |x| < 1)
    // values stay inside the documented GROUP domain (Σ|hi| < 9e18):
    // ~7.4k rows/group bounds |x| below ~1.2e6 here — log magnitudes
    // and 1e5-scale magnitudes both comfortably inside
    val rnd = new scala.util.Random(0x5917)
    val vals: Seq[java.lang.Double] =
      Seq.fill(20000)(Double.box(-rnd.nextDouble() * 25.0)) ++
        Seq.fill(2000)(Double.box(rnd.nextDouble() * 1.0e5 * (if (rnd.nextBoolean()) 1 else -1))) ++
        Seq(1.00000000000000005, -1.00000000000000005).map(Double.box) ++
        Seq.fill(9)(null.asInstanceOf[java.lang.Double])
    val df = rnd.shuffle(vals).zipWithIndex
      .map { case (v, i) => (i % 3, Option(v).map(_.doubleValue)) }.toDF("g", "v")
    val got = df.groupBy("g").agg(dsum_exact_split(col("v"), 18).as("x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.get(1)))
    val want = df.groupBy("g")
      .agg(sum(col("v").cast(DecimalType(38, 18))).cast("double").as("x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.get(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("dsum_exact_split: a value past the split range raises") {
    // |x| >= 9.2e9 at scale 18 -> the hi half exceeds int64
    val df = Seq(1.0e10).toDF("v")
    val e = intercept[Throwable] { df.agg(dsum_exact_split(col("v"), 18)).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]), s"got $e")
  }

  test("an all-null group sums to null, not a raise") {
    val df = Seq((0, None: Option[Double]), (0, None)).toDF("g", "v")
    val out = df.groupBy("g").agg(dsum_exact(col("v"), 4).as("x")).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("dsum_exact_over equals the decimal window sum (running frame)") {
    val w = Window.orderBy("i")
    val df = adversarial.zipWithIndex
      .map { case (v, i) => (i, Option(v).map(_.doubleValue)) }.toDF("i", "v")
    val got = df.withColumn("x", dsum_exact_over(col("v"), 6, w))
      .orderBy("i").collect().map(_.get(2))
    val want = df.withColumn("x",
        sum(col("v").cast(DecimalType(38, 6))).over(w).cast("double"))
      .orderBy("i").collect().map(_.get(2))
    assert(got.toSeq == want.toSeq)
  }

  test("a value past the int64 unscaled range raises, not silently wrong") {
    // 1e15 at scale 4 -> unscaled 1e19 > 2^63: the decimal path would
    // represent it, so the kernel must REFUSE loudly rather than wrap
    val df = Seq(1.0e15).toDF("v")
    val e = intercept[Throwable] {
      df.agg(dsum_exact(col("v"), 4)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException in the cause chain, got $e")
  }

  test("a group past the fast fence computes EXACTLY via the split fallback (r19)") {
    // three rows of 4e14 at scale 4: each unscaled 4e18 fits int64, the
    // sum 1.2e19 does not — the fast accumulator would wrap/throw, so
    // until r19 this group raised. The advisor's parity point: the
    // decimal plan this kernel replaced computed such magnitudes
    // correctly, so the fence must degrade to the exact hi/lo split
    // accumulation (try_sum keeps the discarded fast branch from
    // ANSI-throwing mid-aggregation), not to an error. Expected value
    // computed independently in BigDecimal.
    val df = Seq(4.0e14, 4.0e14, 4.0e14, 1.23456789, -0.00005).toDF("v")
    val got = df.agg(dsum_exact(col("v"), 4).as("x")).collect()(0).getDouble(0)
    val want = Seq(4.0e14, 4.0e14, 4.0e14, 1.23456789, -0.00005)
      .map(java.math.BigDecimal.valueOf(_)
        .setScale(4, java.math.RoundingMode.HALF_UP))
      .reduce(_ add _).doubleValue()
    assert(got == want, s"got $got want $want")
    // and the fallback is branch-for-branch consistent with the fast
    // path where both are in domain: a small group must be unchanged
    val smallGot = df.where(col("v") < 1.0e14)
      .agg(dsum_exact(col("v"), 4).cast("double")).collect()(0).getDouble(0)
    val smallWant = df.where(col("v") < 1.0e14)
      .agg(sum(col("v").cast(DecimalType(38, 4))).cast("double"))
      .collect()(0).getDouble(0)
    assert(smallGot == smallWant)
  }

  test("split-fallback parity with the decimal sum across many past-fence groups") {
    // randomized groups engineered past the Σ|u| < 9e18 fast fence
    // (values ~1e14 at scale 4 → unscaled ~1e18; 10+ rows/group) but
    // far inside the split domain — every group must equal the
    // DECIMAL(38,4) sum bit-for-bit after the double cast
    val rnd = new scala.util.Random(0x1909)
    val vals = Seq.fill(200)(
      (rnd.nextDouble() * 8.0e14) * (if (rnd.nextInt(10) == 0) -1 else 1) +
        rnd.nextDouble())
    val df = vals.zipWithIndex.map { case (v, i) => (i % 4, v) }.toDF("g", "v")
    val got = df.groupBy("g").agg(dsum_exact(col("v"), 4).as("x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.get(1)))
    val want = df.groupBy("g")
      .agg(sum(col("v").cast(DecimalType(38, 4))).cast("double").as("x"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.get(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("the fence is the TIGHT sum-of-|unscaled| bound, not count*max") {
    // the advisor's false-positive shape: one large value among many
    // small ones — count·max|u| would estimate 2001 × 8e18 ≈ 1.6e22 and
    // raise, but the true Σ|u| ≈ 8.02e18 < 9e18 fits the accumulator,
    // so the tight fence must let the exact sum through
    val df = (Seq(8.0e14) ++ Seq.fill(2000)(0.0001)).toDF("v")
    val got = df.agg(dsum_exact(col("v"), 4).cast("double")).collect()(0).getDouble(0)
    val want = df.agg(sum(col("v").cast(DecimalType(38, 4))).cast("double"))
      .collect()(0).getDouble(0)
    assert(got == want)
  }
}
