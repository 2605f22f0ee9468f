package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off trainer for the committed PQ codebook FIXTURE
  * (`src/main/resources/graft/pq_trained_codebook.txt`) — the
  * [[TrainIvfFixture]] pattern applied to product quantization.
  *
  * Per-subspace k-means means are float-order dependent, so the live
  * Lloyd run ([[graft.ops.Similarity.pqTrainedCodebook]]) can't be gated
  * by the DuckDB hash oracle. The SERVE path can: train once here, commit
  * the codebook as text (one line per centroid: `s codeId v1 .. v8`,
  * `Double.toString` — the shortest decimal that round-trips to the same
  * IEEE double), and both `s_ann_pq_trained` / `s_ann_ivfpq_trained` and
  * their oracle SQL are parameterized on the SAME values — encode, ADC
  * and refine are deterministic given the codebook.
  *
  * Usage: `sbt "runMain graft.tools.TrainPqFixture /root/testdata/sf0.01"`
  * then commit the rewritten fixture. Trained on the sf0.01 embeddings
  * (m = 8, subDim = 8, kCode = 16, iters = 5), serving all SFs — a fixed
  * quantizer artifact, exactly like a production PQ index.
  */
object TrainPqFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/pq_trained_codebook.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val cb = graft.ops.Similarity.pqTrainedCodebook(corpus,
        m = 8, subDim = 8, kCode = 16, iters = 5)
      .select("s", "codeId", "cb_sub").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val dir = java.nio.file.Paths.get(out).getParent
    if (dir != null) java.nio.file.Files.createDirectories(dir)
    val text = cb.map { case (s, c, v) =>
      (s.toString +: c.toString +: v.map(_.toString)).mkString(" ")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      text.getBytes("UTF-8"))
    println(s"wrote ${cb.length} codebook rows (subDim ${cb.head._3.length}) to $out")
    spark.stop()
  }
}
