package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.functions.BandFunctions

/** Property suite for the one-pass band-bucket kernel
  * ([[graft.functions.BandOps.bandBuckets]]) against the defining
  * per-band [[graft.ops.Similarity.hyperplaneBucket]] folds — the
  * wordsArr/BpeOps discipline. Equality must be EXACT (bucket ids are
  * join keys; one flipped sign bit is a different bucket), so the
  * kernel's per-plane sum replicates DotProduct's ascending sequential
  * IEEE fold bit-for-bit. The generator stresses the float edges: tiny
  * and huge magnitudes (where summation order matters most), exact
  * zeros (the `> 0` boundary — a zero projection must emit bit 0 in
  * both forms), negative-heavy vectors, short (< 64-dim) vectors (the
  * min-length loop), and every banding width the shipped queries use
  * (4..13 planes, 1..8 bands, probe offsets).
  */
object BandKernelSpec extends Properties("bandKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30).withWorkers(1)

  private lazy val spark = TestSpark.session

  private val genVal: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(-2.0, 2.0),
    2 -> Gen.chooseNum(-1e9, 1e9),
    2 -> Gen.chooseNum(-1e-9, 1e-9),
    1 -> Gen.const(0.0))
  private val genVec: Gen[Seq[Double]] = Gen.frequency(
    6 -> Gen.listOfN(64, genVal),
    2 -> Gen.chooseNum(1, 63).flatMap(n => Gen.listOfN(n, genVal)),
    1 -> Gen.const(Seq.fill(64)(0.0)), // every projection exactly 0
    1 -> Gen.const(Seq.empty[Double]))

  property("kernel buckets equal the defining hyperplaneBucket folds") =
    forAll(Gen.listOfN(8, genVec), Gen.chooseNum(1, 13),
        Gen.chooseNum(1, 8), Gen.oneOf(0, 7, 100)) { (vecs, planes, bands, first) =>
      import spark.implicits._
      val defining = array((0 until bands).map(b =>
        Similarity.hyperplaneBucket(col("v"), planes, first + b * planes)): _*)
      val diff = vecs.toDF("v")
        .select(BandFunctions.band_buckets(col("v"), planes, bands, first).as("k"),
          defining.as("r"))
        .where(not(col("k") <=> col("r")))
      diff.count() == 0L
    }

  property("plane_dots equals the per-plane DotProduct folds (both families)") =
    forAll(Gen.listOfN(6, genVec), Gen.chooseNum(1, 16),
        Gen.oneOf("band", "proj"), Gen.oneOf(0, 100)) { (vecs, planes, family, first) =>
      import spark.implicits._
      val signOf: (Int, Int) => Double =
        if (family == "band") Similarity.bandSign else Similarity.projSign
      val defining = array((0 until planes).map { p =>
        graft.functions.VectorFunctions.dot_product(col("v"),
          array((1 to 512).map(i => lit(signOf(first + p, i))): _*))
      }: _*)
      val diff = vecs.toDF("v")
        .select(graft.functions.BandFunctions
            .plane_dots(col("v"), planes, family, first).as("k"),
          defining.as("r"))
        .where(not(col("k") <=> col("r")))
      diff.count() == 0L
    }

  property("NULL vector -> NULL buckets") = {
    import spark.implicits._
    Seq(Option.empty[Seq[Double]]).toDF("v")
      .select(BandFunctions.band_buckets(col("v"), 4, 8).as("k"))
      .collect().head.isNullAt(0)
  }
}
