package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off trainer for the committed IVF centroid FIXTURE
  * (`src/main/resources/graft/ivf_trained_centroids.txt`).
  *
  * K-means mean aggregation is float-order dependent, so a live Lloyd run
  * can't be gated by the DuckDB hash oracle. The serve path CAN: train
  * once here, commit the centroids as a text fixture (one line per
  * centroid: `centId v1 .. v64`, `Double.toString` — the shortest decimal
  * that round-trips to the same IEEE double, so Spark and DuckDB parse
  * bit-identical values), and both `s_ann_ivf_trained*` queries and their
  * oracle SQL are parameterized on the SAME values — assignment, probe
  * and rescore are deterministic given the centroids.
  *
  * Usage: `sbt "runMain graft.tools.TrainIvfFixture /root/testdata/sf0.01"`
  * then commit the rewritten fixture. The snapshot is trained on the
  * sf0.01 embeddings (nCells = 16, iters = 5) and SERVES all SFs — a
  * fixed quantizer artifact, exactly like a production ANN index.
  */
object TrainIvfFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/ivf_trained_centroids.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val cent = graft.ops.Similarity.kmeansCentroids(corpus, nCells = 16, iters = 5)
      .select("centId", "cent_v").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1)
    val dir = java.nio.file.Paths.get(out).getParent
    if (dir != null) java.nio.file.Files.createDirectories(dir)
    val text = cent.map { case (id, v) =>
      (id.toString +: v.map(_.toString)).mkString(" ")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      text.getBytes("UTF-8"))
    println(s"wrote ${cent.length} centroids (dim ${cent.head._2.length}) to $out")
    spark.stop()
  }
}
