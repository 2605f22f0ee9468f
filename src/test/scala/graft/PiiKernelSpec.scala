package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Fuzz suite for the one-pass PII kernel
  * ([[graft.functions.PiiScanOps]]) against the DEFINING staged regex
  * chain ([[graft.ops.Pii.chainExprs]] — the DuckDB oracle's form): the
  * scrubbed text and all five counts must be byte/value-identical. The
  * generator is adversarial PII soup — digit runs of boundary lengths
  * (2, 3, 4, 12, 13, 18, 19), dashes, dots, '@', '+', '_', '%', letters,
  * and real specimens with single-char mutations — aimed at every edge
  * the scanner's structural-equivalence argument leans on: email
  * swallowing digit spans leftward, `\b` against a placeholder's `]`,
  * octet/exact-width backtracking, the optional phone prefix, greedy
  * TLD backtracking, and adjacent-match boundary effects.
  */
object PiiKernelSpec extends Properties("piiKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(80).withWorkers(1)

  private lazy val spark = TestSpark.session

  private val genAtom: Gen[String] = Gen.frequency(
    4 -> Gen.chooseNum(1, 20).flatMap(k =>
      Gen.listOfN(k, Gen.numChar).map(_.mkString)),
    3 -> Gen.oneOf("-", ".", "@", "+", "_", "%", " ", "  ", "]", "["),
    3 -> Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.alphaChar).map(_.mkString)),
    2 -> Gen.oneOf("a@b.co", "x@1.2.3.4", "user.name+tag@example.com",
      "10.0.0.1", "1.2.3.4", "255.255.255.255", "1234.5.6.7",
      "555-123-4567", "+1-555-123-4567", "91-555-123-4567",
      "123-45-6789", "1234567890123", "123456789012345678",
      "1234567890123456789", "1.2.3.4.x@y.com", "555-123-4567_a@b.co",
      "a@b.co555-12-3456", "123-45-6789-1234", "12-345-678-9012"),
    1 -> Gen.oneOf("999", "99", "9999", "12", "4567"))

  private val genText: Gen[String] = Gen.frequency(
    9 -> Gen.chooseNum(0, 24).flatMap(k =>
      Gen.listOfN(k, genAtom).map(_.mkString)),
    1 -> Gen.const(""))

  property("kernel scrub equals the staged regex chain (text + 5 counts)") =
    forAll(Gen.listOfN(12, genText)) { texts =>
      import spark.implicits._
      val (kClean, kCounts) = graft.ops.Pii.scrubExprs(col("t"))
      val (cClean, cCounts) = graft.ops.Pii.chainExprs(col("t"))
      val diffCond = (kClean =!= cClean) ||
        kCounts.zip(cCounts).map { case ((_, k), (_, c)) => k =!= c }
          .reduce(_ || _)
      val cols = Seq(col("t"), kClean.as("k"), cClean.as("c")) ++
        kCounts.map(_._2).zipWithIndex.map { case (e, i) => e.as(s"k$i") } ++
        cCounts.map(_._2).zipWithIndex.map { case (e, i) => e.as(s"c$i") }
      val diff = texts.toDF("t").select(cols: _*).where(diffCond)
      val rows = diff.collect()
      if (rows.nonEmpty) println("PII KERNEL DIVERGENCE: " + rows.head)
      rows.isEmpty
    }

  property("null text propagates as null clean text and null counts") = {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(graft.ops.Pii.scrubExprs(col("t"))._1.as("c"),
        graft.ops.Pii.scrubExprs(col("t"))._2.head._2.as("n"))
      .collect().head
    r.isNullAt(0) && r.isNullAt(1)
  }
}
