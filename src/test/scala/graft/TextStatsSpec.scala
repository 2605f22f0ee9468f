package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Parity pin: the one-pass TextStatsOps kernel must produce byte-identical
  * results to the HOF column-expression reference (`analyzeHof`) — same
  * language cascade, same double arithmetic and HALF_UP rounding, same
  * tokenizers, same fingerprint fold — on testdata plus edge cases.
  */
class TextStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val samples: Seq[String] = Seq(
    "", "   ", "!!!", "der der und ist", "le la les et est",
    "el los y es con un una", "tab\tand\nnewline\rcharshere",
    "The QUICK brown FOX—jumps; over the lazy dog!!",
    "numbers 123 and 456 mix3d in 7",
    "a" * 250 + " the of and to in is it " * 20) ++
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(50).collect().map(_.getString(0)).toSeq

  test("kernel analyze equals HOF reference on testdata + edge cases") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val cols = Seq("doc_id", "langGuess", "quality", "nTokensWs", "nTokensBpe", "fingerprint")
    val fast = TextAnalysis.analyze(df).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ref = TextAnalysis.analyzeHof(df).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    samples.indices.foreach { i =>
      assert(fast(i.toLong) == ref(i.toLong),
        s"sample $i '${samples(i).take(40)}': kernel=${fast(i.toLong)} ref=${ref(i.toLong)}")
    }
  }
}
