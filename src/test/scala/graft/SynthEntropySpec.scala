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

  // ---- text-fixture canary (r18): the Caesar-rotation replica family
  // the scale tools build text decades from (Synth.rotate) shares the
  // media generators' risk class — a degenerate replica transform leaves
  // cross-replica fingerprints near-identical, plants false cross-replica
  // near-dup structure, and the pair space grows quadratically. Same
  // two-size distinct-count + cross-group-distance assertions, over the
  // 31-bit text simhash the dedup operators actually block on.

  /** Driver-side mirror of [[Synth.rotate]] (lowercase, then the alphabet
    * translate) — the canary measures the rule, so it recomputes it from
    * the same definition shape rather than spinning a Spark job per call.
    */
  private def rotateStr(s: String, r: Int): String = {
    val lo = s.toLowerCase(java.util.Locale.ROOT)
    if (r % 26 == 0) lo
    else lo.map { ch =>
      val i = Synth.Alpha.indexOf(ch)
      if (i < 0) ch else Synth.Alpha((i + r) % 26)
    }
  }

  private def simhashOf(s: String): Long =
    graft.functions.TextHashOps.simhash31(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  private lazy val baseDocs: Seq[String] = {
    val spark = TestSpark.session
    // the fixture PLANTS near-duplicates (that is its job) — the canary
    // measures the replica TRANSFORM, so start from simhash-distinct
    // bases or the planted collisions would mask a degenerate transform
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").limit(400).collect().map(_.getString(0)).toSeq
      .filter(s => s != null && s.nonEmpty && simhashOf(s) != -1L)
    val seen = scala.collection.mutable.HashSet[Long]()
    all.filter(d => seen.add(simhashOf(d))).take(250)
  }

  private def shinglesOf(s: String): Set[Long] = {
    val arr = graft.functions.TextHashOps.shingleHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 3)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  private case class TextEntropy(d1: Int, d2: Int, meanCross: Double,
      meanOverlap: Double, maxOverlap: Double)

  /** Two-size entropy of a text replica transform: simhash fingerprints
    * of every (doc, replica) at `r1` and `r2` replica classes, same-doc
    * CROSS-replica Hamming stats (31-bit space), and same-doc
    * cross-replica SHINGLE overlap (the invariant the Synth family
    * actually documents: "disjoint shingle sets — corpus grows without
    * synthetic duplicate explosion"). A healthy transform keeps the
    * fingerprint set growing ~linearly, replicas' simhashes clear of the
    * blocking band, and shingle sets ~disjoint; a degenerate one
    * (replicas = tiny constant edits) collapses all three.
    */
  private def measureText(transform: (String, Int) => String,
      r1: Int, r2: Int): TextEntropy = {
    val f2 = baseDocs.map(d => (0 until r2).map(r => simhashOf(transform(d, r))))
    val d2 = f2.flatten.distinct.size
    val d1 = f2.map(_.take(r1)).flatten.distinct.size
    val dists = for {
      (reps, i) <- f2.zipWithIndex
      a <- 0 until r2; b <- (a + 1) until r2
      if (i + a + b) % 3 == 0 // deterministic sample of same-doc pairs
    } yield java.lang.Long.bitCount(reps(a) ^ reps(b))
    // shingle overlap over a deterministic doc sample (sets are costlier
    // than one fingerprint, so sample docs, every replica pair)
    val overlaps = for {
      (d, i) <- baseDocs.zipWithIndex if i % 10 == 0
      sets = (0 until r2).map(r => shinglesOf(transform(d, r)))
      a <- 0 until r2; b <- (a + 1) until r2
      if sets(a).nonEmpty && sets(b).nonEmpty
    } yield (sets(a) & sets(b)).size.toDouble / math.min(sets(a).size, sets(b).size)
    TextEntropy(d1, d2, dists.sum.toDouble / dists.size,
      overlaps.sum / overlaps.size, overlaps.max)
  }

  /** Calibrated to what the replica family must GUARANTEE (measured on
    * the shipped rotation family: d1 715/750, d2 2254/2500, mean Hamming
    * 9.36, overlap 0): digit/punctuation words are rotation-invariant by
    * design, so cross-replica simhashes share SOME votes — the gate is
    * "clear of the dedup blocking band" (mean ≥ 2× the operators'
    * maxHamming 4), not "independent at bits/2". Shingle sets are the
    * hard disjointness claim: containment ≤ 2% mean, ≤ 35% worst doc
    * (3-gram shingles with ≥ 1 alphabetic word rotate; an all-digit
    * pocket can survive — a TINY worst-case overlap is the fixture's
    * true shape, full containment is the defect).
    */
  private def textHealthy(e: TextEntropy, r1: Int, r2: Int): Boolean = {
    val n = baseDocs.size
    e.d1 >= 0.85 * n * r1 && e.d2 >= 0.85 * n * r2 &&
      e.meanCross >= 8 && e.meanOverlap <= 0.02 && e.maxOverlap <= 0.35
  }

  test("Caesar-rotation text replicas: fingerprints grow, shingle sets ~disjoint, clear of the blocking band") {
    val e = measureText(rotateStr, 3, 10)
    assert(textHealthy(e, 3, 10), s"text rotation family degenerated: $e")
  }

  test("the canary REJECTS a suffix-tag text replica generator (the degenerate shape)") {
    // the defect shape for text: replicas that differ by a constant tiny
    // edit (here a replica-keyed suffix word) — shingle sets nearly
    // contain each other and simhashes sit a bit apart, so cross-replica
    // blocking explodes quadratically exactly like the pre-r16 affine
    // media generators
    val e = measureText((d, r) => d + " rep" + r, 3, 10)
    assert(!textHealthy(e, 3, 10),
      s"canary failed to flag a suffix-tag replica family: $e")
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
