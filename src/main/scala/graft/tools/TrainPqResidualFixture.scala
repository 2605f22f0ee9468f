package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off trainer for the committed RESIDUAL PQ codebook fixture
  * (`src/main/resources/graft/pq_residual_codebook.txt`) — the
  * [[TrainPqFixture]] pattern, but the per-subspace Lloyd runs on
  * residuals vec − assigned-fixture-centroid (Jegou et al. 2011 IVFADC),
  * under the SAME committed IVF centroids the serve path routes with.
  *
  * A separate tool (not a TrainPqFixture mode) so re-training the
  * residual codebook can never rewrite the already-committed raw
  * codebook: Lloyd means are float-order dependent, so a rerun is not
  * guaranteed to reproduce the committed bits.
  *
  * Usage: `sbt "runMain graft.tools.TrainPqResidualFixture /root/testdata/sf0.01"`
  * then commit the fixture. Same line format as the raw codebook:
  * `s codeId v1 .. v8`, `Double.toString` values.
  */
object TrainPqResidualFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/pq_residual_codebook.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val cb = graft.ops.Similarity.pqResidualCodebook(corpus,
        graft.SparkEntry.fixtureCentroids(spark),
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
    println(s"wrote ${cb.length} residual-codebook rows (subDim ${cb.head._3.length}) to $out")
    spark.stop()
  }
}
