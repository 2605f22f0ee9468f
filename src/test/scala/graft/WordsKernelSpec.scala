package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suite for the one-pass words kernel
  * ([[graft.functions.TextHashOps.wordsArr]]) against the defining regex
  * chain of [[graft.ops.TextAnalysis.words]], pinned for the
  * STRING-returning kernel the whole tokenize-and-count family rides
  * through. Two planes:
  *  - the full ASCII line (controls, punctuation, digits, upper/lower
  *    case, runs of separators, empty and blank strings) — the testdata
  *    contract;
  *  - a Unicode plane seeded with exactly the divergence-class
  *    characters the r16 advisor flagged — U+212A KELVIN SIGN (Unicode
  *    lowercase = ASCII 'k') and U+0130 İ (full lowercase = 'i' +
  *    combining dot) — plus accented/fullwidth/CJK/combining
  *    bystanders, pinning the kernel's pre-fold of the two code points
  *    and its separator treatment of everything else multi-byte.
  * The kernel is defined EQUAL to the chain on all input; a failure on
  * either plane is a kernel bug, not a contract gap.
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

  // Unicode plane: heavy on the two pre-folded code points and their
  // neighbors (combining dot, dotless ı), with accented / fullwidth /
  // CJK / emoji bystanders that must all act as separators
  private val genUniChar: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    3 -> Gen.oneOf('K', 'İ'),
    2 -> Gen.oneOf('̇', 'ı', 'É', 'ü', 'ß',
      'Ａ', '中', 'Å'),
    1 -> Gen.oneOf(".,;!?-".toSeq))
  private val genUniText: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(genUniChar).map(_.mkString),
    1 -> Gen.const("AKB cİd"),
    1 -> Gen.const("KİK"),
    1 -> Gen.const("İ̇x"))

  private def kernelEqualsChain(texts: List[String]): Boolean = {
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

  property("kernel equals the defining regex chain on the ASCII line") =
    forAll(Gen.listOfN(16, genText))(kernelEqualsChain)

  property("kernel equals the defining regex chain on the Unicode plane") =
    forAll(Gen.listOfN(16, genUniText))(kernelEqualsChain)
}
