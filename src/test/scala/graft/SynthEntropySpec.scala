package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.tools.Synth

/** Fixture NON-DEGENERACY gate — the cheap canary for the defect class
  * that cost r16 a full sf1.0 sweep to find twice: a synthetic fixture
  * family whose fingerprint space is FIXED-SIZE (an affine generator's
  * groups are constant translates of one progression), so cross-group
  * fingerprints collide, the "near-dup pair" output grows QUADRATICALLY
  * with the corpus, and every rate/removal oracle built on it measures
  * the fixture, not the operator.
  *
  * The canary, per synthetic dedup-fixture family, sampled at two corpus
  * sizes (so a plateau is visible, not just a low count):
  *  - the distinct-fingerprint count grows ~linearly with the group
  *    count — a fixed-size space plateaus at the second size;
  *  - cross-group Hamming distance stays near bits/2 (mean ~32 of 64,
  *    bounded min) — entropy, not just cardinality;
  *  - within-group distance stays inside the operator's maxHamming 4 —
  *    the planted families survive the entropy fix.
  *
  * Teeth: the same canary is run against in-test AFFINE references —
  * the exact generator shape [[Multimodal.nearDupPixel]] /
  * [[Multimodal.nearDupSample]] shipped with before r16 (group-keyed
  * affine pixel/sample lines) — and must REJECT them. Reverting either
  * generator to an affine form therefore fails this suite directly.
  *
  * The PLAIN fixtures ([[Multimodal.fixturePixel]]/`fixtureSample`) stay
  * affine BY DESIGN and are not gated: they feed decode-checksum rows
  * (each asset checked against its own closed form), never a pair space.
  */
class SynthEntropySpec extends AnyFunSuite {

  // ---- fingerprint builders over a (id, x, y) pixel / (id, t) sample line

  private def ndupDims(g: Long): (Int, Int) =
    ((8 + Math.floorMod(g * 7 + 3, 24)).toInt,
      (8 + Math.floorMod(g * 13 + 5, 24)).toInt)

  private def imageFp(pixel: (Long, Int, Int) => Long)(id: Long): Long = {
    val (w, h) = ndupDims(id / 4)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(id, x, y).toInt); x += 1 }
      y += 1
    }
    Multimodal.dhash64(img)
  }

  private def audioFp(sample: (Long, Int) => Int)(id: Long): Long = {
    val n = (65L * (10 + Math.floorMod(id / 4, 8))).toInt
    val arr = Array.tabulate[Short](n)(t => sample(id, t).toShort)
    Multimodal.audioFingerprint64(arr)
  }

  // ---- the affine references the canary must reject: the pre-r16 shape
  // (group-keyed affine lines — adjacent groups are constant translates,
  // so the 64-bit comparison pattern cycles in a tiny space)

  private def affinePixel(id: Long, x: Int, y: Int): Long = {
    val g = id / 4
    val r = Math.floorMod(x * 7L + y * 13L + g, 256)
    val gg = Math.floorMod(x * 11L + y * 3L + g * 5L, 256)
    val b = Math.floorMod(x * 5L + y * 17L + g * 11L, 256)
    val base = (r << 16) | (gg << 8) | b
    if (x < 2 && y % 2 == 0)
      (Math.floorMod((base >> 16) + 8L * (id % 4), 256) << 16) | (base & 0xffff)
    else base
  }

  private def affineSample(id: Long, t: Int): Int = {
    val base = Math.floorMod(2029L * t + 48271L * (id / 4) + 12345L, 65536L)
    val bump = if (t % 97 < 5) 512L * (id % 4) else 0L
    (Math.floorMod(base + bump, 65536L) - 32768L).toInt
  }

  // ---- the canary

  private case class Entropy(d1: Int, d2: Int, meanCross: Double, minCross: Int)

  /** Group-representative fingerprints (variant 0) at two corpus sizes +
    * cross-group Hamming stats over a deterministic pair sample.
    */
  private def measure(fp: Long => Long, n1: Int, n2: Int): Entropy = {
    val f2 = (0 until n2).map(g => fp(4L * g))
    val f1 = f2.take(n1)
    var sum = 0L
    var min = 64
    var n = 0
    var i = 0
    while (i < 2000) {
      val a = (i * 7919 + 13) % n2
      val b = (i * 104729 + 31) % n2
      if (a != b) {
        val d = java.lang.Long.bitCount(f2(a) ^ f2(b))
        sum += d
        if (d < min) min = d
        n += 1
      }
      i += 1
    }
    Entropy(f1.distinct.size, f2.distinct.size, sum.toDouble / n, min)
  }

  private def healthy(e: Entropy, n1: Int, n2: Int): Boolean =
    e.d1 >= 0.95 * n1 && e.d2 >= 0.95 * n2 &&
      e.meanCross >= 24 && e.meanCross <= 40 && e.minCross >= 6

  private val N1 = 250
  private val N2 = 2500

  test("near-dup image fingerprint space: linear growth, cross-group distance ~ bits/2") {
    val e = measure(imageFp(Multimodal.nearDupPixel), N1, N2)
    assert(healthy(e, N1, N2), s"image fixture degenerated: $e")
  }

  test("near-dup audio fingerprint space: linear growth, cross-group distance ~ bits/2") {
    val e = measure(audioFp(Multimodal.nearDupSample), N1, N2)
    assert(healthy(e, N1, N2), s"audio fixture degenerated: $e")
  }

  test("planted image families stay within the operator's maxHamming 4") {
    val fp = imageFp(Multimodal.nearDupPixel) _
    assert((0 until 150).forall { g =>
      val base = fp(4L * g)
      (1 to 3).forall(v =>
        java.lang.Long.bitCount(base ^ fp(4L * g + v)) <= 4)
    })
  }

  test("planted audio families stay within the operator's maxHamming 4") {
    val fp = audioFp(Multimodal.nearDupSample) _
    assert((0 until 150).forall { g =>
      val base = fp(4L * g)
      (1 to 3).forall(v =>
        java.lang.Long.bitCount(base ^ fp(4L * g + v)) <= 4)
    })
  }

  test("the canary REJECTS the affine image generator (the pre-r16 defect shape)") {
    val e = measure(imageFp(affinePixel), N1, N2)
    assert(!healthy(e, N1, N2),
      s"canary failed to flag an affine pixel line: $e")
  }

  test("the canary REJECTS the affine audio generator (the pre-r16 defect shape)") {
    val e = measure(audioFp(affineSample), N1, N2)
    assert(!healthy(e, N1, N2),
      s"canary failed to flag an affine sample line: $e")
  }

  test("embedding replica masks: all distinct, cross-mask agreement ~ dims/2") {
    // the Synth.replicaMask family (StressX100/RecallX100 corpora): an
    // affine mask family measured two IDENTICAL masks in 100 (r15) —
    // packed sign patterns must be distinct and pairwise ~32/64 apart
    val packed = (0 until 1000).map { r =>
      Synth.replicaMask(r).zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
        if (m > 0) acc | (1L << (i % 64)) else acc
      }
    }
    assert(packed.distinct.size == 1000, "replica mask collision")
    val dists = for (i <- 0 until 999) yield
      java.lang.Long.bitCount(packed(i) ^ packed(i + 1))
    val mean = dists.sum.toDouble / dists.size
    assert(mean >= 24 && mean <= 40 && dists.min >= 6,
      s"replica masks correlate: mean $mean, min ${dists.min}")
  }
}
