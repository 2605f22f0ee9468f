package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off trainer for the committed unigram-LM piece FIXTURE
  * (`src/main/resources/graft/unigram_trained_pieces.txt`) — the
  * [[TrainIvfFixture]] / [[TrainPqFixture]] pattern applied to the
  * unigram tokenizer.
  *
  * The live EM loop stays OpsSpec-gated, but the SERVE path is now
  * DuckDB-oracle-gatable: the trainer emits log probabilities on a 2⁻⁴⁰
  * dyadic grid (ops.Unigram.mStep), so every Viterbi path sum is exact
  * double arithmetic and any engine replaying the same literal values —
  * with the longest-final-piece tie-break — derives identical
  * segmentations. Train once here, commit the piece table as text
  * (first line `! maxPieceLen unkLogProb`, then `piece count logProb`
  * per line, `Double.toString` values), and `d_unigram_tokens` plus its
  * oracle SQL are parameterized on the SAME values.
  *
  * Usage: `sbt "runMain graft.tools.TrainUnigramFixture /root/testdata/sf0.01"`
  * then commit the rewritten fixture.
  */
object TrainUnigramFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/unigram_trained_pieces.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = graft.ops.Unigram.train(docs, "text", vocabSize = 300,
      maxPieceLen = 4, emRounds = 3, seedMultis = 256)
    val dir = java.nio.file.Paths.get(out).getParent
    if (dir != null) java.nio.file.Files.createDirectories(dir)
    val header = s"! ${m.maxPieceLen} ${m.unkLogProb}"
    val lines = m.pieces.map(p => s"${p.piece} ${p.count} ${p.logProb}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (header +: lines).mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"wrote ${m.pieces.size} pieces (maxLen ${m.maxPieceLen}) to $out")
    spark.stop()
  }
}
