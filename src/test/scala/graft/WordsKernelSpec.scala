package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suite for the one-pass words kernel
  * ([[graft.functions.TextHashOps.wordsArr]]) against the defining regex
  * chain of [[graft.ops.TextAnalysis.words]] — the same ASCII-contract
  * equality every hash kernel in TextHashOps carries, here pinned for
  * the STRING-returning kernel the whole tokenize-and-count family now
  * rides through. The generator sweeps the full ASCII line (controls,
  * punctuation, digits, upper/lower case, runs of separators, empty and
  * blank strings), which is the testdata contract and the domain where
  * the two forms are defined to agree.
  */
object WordsKernelSpec extends Properties("wordsKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60).withWorkers(1)

  private lazy val spark = TestSpark.session

  // ASCII line weighted toward word/separator boundaries; standalone
  // edges keep the degenerate shapes in every run
  private val genChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    2 -> Gen.oneOf(".,;:!?-_'\"()[]{}@#$%^&*+=<>/\\|~`".toSeq),
    1 -> Gen.choose(0.toChar, 31.toChar),
    1 -> Gen.choose(32.toChar, 126.toChar))
  private val genText: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(genChar).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.const("   "),
    1 -> Gen.const("\t\n\r"),
    1 -> Gen.const("A1b2 C3-d4.E5"))

  property("kernel equals the defining regex chain on the ASCII line") =
    forAll(Gen.listOfN(16, genText)) { texts =>
      import spark.implicits._
      val regexChain = filter(
        split(regexp_replace(lower(col("t")), "[^a-z0-9 ]", " "), " "),
        w => length(w) > 0)
      // null row rides along: both forms must propagate NULL as NULL
      val diff = (texts.map(Option(_)) :+ Option.empty[String]).toDF("t")
        .select(graft.ops.TextAnalysis.words(col("t")).as("k"),
          regexChain.as("r"))
        .where(not(col("k") <=> col("r")))
      diff.count() == 0L
    }
}
