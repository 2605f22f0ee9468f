package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.ops.Bpe
import graft.functions.BpeFunctions

/** Property suite for the BPE merge-application kernel
  * ([[graft.functions.BpeOps.tokenLen]]) against its defining
  * unit-owned-space string algebra ([[graft.ops.Bpe.segmentWithMerges]]
  * + trim/split/filter/size) — the wordsArr/PiiScanOps discipline: a
  * constant-factor kernel ships only with a fuzz pin on the exact form
  * it replaces. The generator stresses the algebra's edges: self-merges
  * (a,a), chained merges whose operands are earlier fusions, DUPLICATE
  * fusion texts reached by different merge paths (("a","bc") after
  * ("b","c") vs ("ab","c") after ("a","b") both write "abc" — the
  * string algebra matches the text, not the path, and so must the
  * kernel's interning), merges that never fire, and empty words.
  */
object BpeKernelSpec extends Properties("bpeKernel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40).withWorkers(1)

  private lazy val spark = TestSpark.session

  // words over a 3-letter alphabet: small enough that random merge
  // tables actually fire, repeatedly and adjacently
  private val genWord: Gen[String] = Gen.frequency(
    8 -> Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', '1')).map(_.mkString)),
    1 -> Gen.const(""),
    1 -> Gen.const("aaaaaa"),
    1 -> Gen.const("banana1banana"))

  // a merge table built left to right, each operand drawn from the
  // current symbol pool (chars + earlier fusions) — chained by
  // construction, with self-merges and duplicate outputs possible
  private val genMerges: Gen[List[(String, String)]] =
    Gen.chooseNum(0, 6).flatMap { n =>
      (1 to n).foldLeft(Gen.const((List.empty[(String, String)],
          Vector("a", "b", "1")))) { (acc, _) =>
        acc.flatMap { case (ms, pool) =>
          for {
            l <- Gen.oneOf(pool)
            r <- Gen.oneOf(pool)
          } yield ((ms :+ (l, r)), pool :+ (l + r))
        }
      }.map(_._1)
    }

  property("kernel count equals the defining string-algebra count") =
    forAll(Gen.listOfN(12, genWord), genMerges) { (words, merges) =>
      import spark.implicits._
      val asMerges = merges.zipWithIndex.map { case ((l, r), i) =>
        Bpe.Merge(i + 1, l, r, 1L)
      }
      val chain = Bpe.segmentWithMerges(col("w"), asMerges)
      val chainCount =
        size(filter(split(trim(chain), " "), t => length(t) > 0))
      // the null row rides along: both forms propagate NULL as NULL
      // (size(NULL) is NULL under the modern default), so <=> covers it
      val diff = (words.map(Option(_)) :+ Option.empty[String]).toDF("w")
        .select(
          BpeFunctions.bpe_token_len(col("w"), merges).as("k"),
          chainCount.as("r"))
        .where(not(col("k") <=> col("r")))
      diff.count() == 0L
    }

  property("NULL word -> NULL count (both forms)") = {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("w")
      .select(BpeFunctions.bpe_token_len(col("w"), List(("a", "b"))).as("k"))
      .collect().head
    r.isNullAt(0)
  }
}
