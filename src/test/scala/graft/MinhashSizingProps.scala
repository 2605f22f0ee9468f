package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property suite for [[graft.ops.Dedup.minhashBandsForThreshold]] — the
  * Jaccard-family banding rule. Scalar-only (the rule is driver-side
  * arithmetic); the claims worth pinning are the DEFINITION (argmin over
  * divisors of the S-curve-midpoint distance, ties to fewer bands), that
  * the result always divides the signature width (bandExplode's
  * requirement), and that the dial moves the right way: a LOWER operating
  * threshold needs MORE bands (fewer rows per band) to keep threshold
  * pairs candidate — monotonicity is what makes it a tuning rule rather
  * than a lookup table.
  */
object MinhashSizingProps extends Properties("minhashBandsForThreshold") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withWorkers(1)

  private def rule(n: Int, t: Double): Int =
    graft.ops.Dedup.minhashBandsForThreshold(n, t)

  private def midpoint(n: Int, b: Int): Double =
    math.pow(1.0 / b, b.toDouble / n)

  private val genN: Gen[Int] = Gen.oneOf(8, 16, 24, 32, 48, 64, 128)
  private val genT: Gen[Double] = Gen.chooseNum(0.01, 1.0)

  property("result divides numHashes") = forAll(genN, genT) { (n, t) =>
    val b = rule(n, t)
    b >= 1 && b <= n && n % b == 0
  }

  property("argmin over all divisors, ties to fewer bands") =
    forAll(genN, genT) { (n, t) =>
      val b = rule(n, t)
      val d = math.abs(midpoint(n, b) - t)
      (1 to n).filter(n % _ == 0).forall { b2 =>
        val d2 = math.abs(midpoint(n, b2) - t)
        d < d2 || (d == d2 && b <= b2)
      }
    }

  property("monotone: lower threshold -> at least as many bands") =
    forAll(genN, genT, genT) { (n, t1, t2) =>
      val (lo, hi) = if (t1 <= t2) (t1, t2) else (t2, t1)
      rule(n, lo) >= rule(n, hi)
    }

  property("pins: the shipped (32, 8) is the rule's choice near 0.6") = {
    rule(32, 0.6) == 8 && rule(32, 0.3) == 16 && rule(32, 0.99) == 1
  }
}
