package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off trainer for the committed SHARDED IVF centroid FIXTURE
  * (`src/main/resources/graft/ivf_sharded_trained_centroids.txt`) —
  * the r19 close of the r18 verdict's "sharded is seeded-only" gap.
  *
  * Same contract as [[TrainIvfFixture]]: per-shard k-means means are
  * float-order dependent, so a live Lloyd run can't be hash-oracled, but
  * SERVING a committed snapshot is deterministic — assignment, per-shard
  * probe and global re-rank are pure functions of the centroid values —
  * so the `s_ann_ivf_sharded_trained*` queries and their DuckDB oracle
  * are parameterized on the SAME literal text (one line per centroid:
  * `shard centId v1 .. v64`, `Double.toString` = the shortest decimal
  * that round-trips to the same IEEE double).
  *
  * Usage: `sbt "runMain graft.tools.TrainIvfShardedFixture /root/testdata/sf0.01"`
  * then commit the rewritten fixture. Trained at nShards = 2 with 16
  * cells per shard, iters = 5 — the per-shard analogue of the unsharded
  * fixture's parameters; the snapshot SERVES all SFs, exactly like a
  * production sharded ANN index.
  */
object TrainIvfShardedFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/ivf_sharded_trained_centroids.txt"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("vec"))
    val cent = graft.ops.Similarity
      .shardedKmeansCentroids(corpus, nShards = 2, nCells = 16, iters = 5)
      .select("shard", "centId", "cent_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val dir = java.nio.file.Paths.get(out).getParent
    if (dir != null) java.nio.file.Files.createDirectories(dir)
    val text = cent.map { case (shard, id, v) =>
      (shard.toString +: id.toString +: v.map(_.toString)).mkString(" ")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      text.getBytes("UTF-8"))
    println(s"wrote ${cent.length} sharded centroids " +
      s"(dim ${cent.head._3.length}) to $out")
    spark.stop()
  }
}
