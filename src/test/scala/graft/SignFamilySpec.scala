package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Pins the statistical properties the two deterministic ±1 plane
  * families must hold — the r15 LSH fix's actual claim, tested, not just
  * asserted in comments.
  *
  * Background: the original banding generator was AFFINE in (plane, dim),
  * so adjacent plane rows differed by a constant pre-bit-extraction shift
  * and correlated heavily (pairwise |corr| up to 1.0, family mean 0.60).
  * A band of k such sign bits collapsed from 2^k buckets to ~2-4
  * effective ones, and at a 100× corpus the LSH candidate set reached
  * 57% of ALL pairs. Bucket entropy IS cross-plane independence — these
  * bounds fail loudly if a future formula tweak reintroduces the affine
  * structure.
  *
  * The bounds are pinned against the measured values of the CURRENT
  * deterministic matrices over the widest shipped banding (15 planes ×
  * 8 bands = 120 planes, 64 dims): mean pairwise |corr| 0.098 ≈ the
  * 0.125·√(2/π) ≈ 0.0997 independent level, max 0.50 over 7140 pairs
  * (≈ 4σ, the expected extreme for that many independent draws), row
  * balance max 0.344. The broken generator's 0.60 mean / 1.0 max sits
  * far outside every bound.
  */
class SignFamilySpec extends AnyFunSuite {

  private val Planes = 120 // widest shipped banding: 15 planes × 8 bands
  private val Dims = 64    // the embeddings fixture width

  private def rows(f: (Int, Int) => Double): IndexedSeq[Array[Double]] =
    (0 until Planes).map(p => Array.tabulate(Dims)(i => f(p, i + 1)))

  /** For ±1 vectors the Pearson correlation IS the mean agreement. */
  private def corr(a: Array[Double], b: Array[Double]): Double =
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum / Dims

  private def pairStats(rs: IndexedSeq[Array[Double]]): (Double, Double) = {
    val cs = for (i <- 0 until Planes; j <- i + 1 until Planes)
      yield math.abs(corr(rs(i), rs(j)))
    (cs.sum / cs.size, cs.max)
  }

  test("bandSign rows are ±1-valued, balanced, and pairwise independent") {
    val rs = rows(Similarity.bandSign)
    assert(rs.flatten.forall(v => v == 1.0 || v == -1.0))
    // per-row balance: |mean| stays inside the binomial band (measured
    // max 0.344; sd of a random row's mean is 1/8)
    assert(rs.map(r => math.abs(r.sum) / Dims).max <= 0.45)
    val (mean, max) = pairStats(rs)
    assert(mean <= 0.15, f"mean pairwise |corr| $mean%.4f — rows correlated")
    assert(max <= 0.70, f"max pairwise |corr| $max%.4f — an affine pair is back")
  }

  test("projSign rows are ±1-valued, balanced, and pairwise independent") {
    val rs = rows(Similarity.projSign)
    assert(rs.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(rs.map(r => math.abs(r.sum) / Dims).max <= 0.45)
    val (mean, max) = pairStats(rs)
    assert(mean <= 0.15, f"mean pairwise |corr| $mean%.4f — rows correlated")
    assert(max <= 0.70, f"max pairwise |corr| $max%.4f — an affine pair is back")
  }

  test("bandSign and projSign are independent FAMILIES (distinct salts/bits)") {
    val bs = rows(Similarity.bandSign)
    val ps = rows(Similarity.projSign)
    // no banding plane may equal (or mirror) a projection plane: same-p
    // rows sharing a formula would re-couple LSH buckets to JL output
    // dims for every operator that uses both on one embedding column
    val cross = for (b <- bs; p <- ps) yield math.abs(corr(b, p))
    assert(cross.max < 1.0, "a banding plane duplicates a projection plane")
    assert(cross.sum / cross.size <= 0.15,
      f"cross-family mean |corr| ${cross.sum / cross.size}%.4f — salts coupled")
  }
}
