package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level diagnostic for the StressX100 cosine cells: times
  * each half of the incremental-cosine probe separately at one decade so
  * the growth can be attributed (index-join candidates vs within-batch
  * pairing vs CC closure vs verify joins).
  *
  * Usage: runMain graft.tools.StressDiag <sfDir> <factor> <planes>
  */
object StressDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val planes = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val e1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    // same corpus as StressX100's, by construction: masks shared via Synth
    def replicateEmb(df: DataFrame, n: Int): DataFrame = {
      val masks = Synth.maskTable(spark, n)
      df.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(n - 1))).as("__rep"))
        .join(broadcast(masks), Seq("__rep"))
        .select((col("vec_id") + col("__rep").cast("long") * 10000000L).as("vec_id"),
          zip_with(col("embedding"), col("__mask"), (x, s) => x * s).as("embedding"))
        .localCheckpoint()
    }
    val emb = if (factor == 1) e1 else replicateEmb(e1, factor)
    val vecBatch = e1.where(pmod(col("vec_id"), lit(10)) === 3)
      .select((col("vec_id") + 9000000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val index = graft.ops.Dedup.cosineIndex(emb, "vec_id", "embedding",
      planesPerBand = planes, bands = 8).localCheckpoint()
    val store = graft.ops.Dedup.cosineVecStore(emb, "vec_id", "embedding")
      .localCheckpoint()
    println(s"emb ${emb.count()} index ${index.count()} planes $planes")
    // bucket skew: top-10 (band,bucket) sizes in the index
    index.groupBy("band", "bucket").count().orderBy(desc("count"))
      .limit(10).collect().foreach(r => println(s"  hub ${r.mkString(",")}"))

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }

    // stage timings mirror dedupIncrementalCosine's internal structure
    val withVec = vecBatch.select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", graft.ops.Similarity.norm(col("v")))
      .localCheckpoint(true)
    val banded = graft.ops.Dedup.cosineBandRows(
      withVec.select("doc_id", "v", "nrm"), planes, 8).localCheckpoint(true)
    t("probe banding (cached above)") { banded.count() }
    val cand = banded.select("doc_id", "band", "bucket")
      .join(index, Seq("band", "bucket"))
      .where(col("doc_id") =!= col("corpusId"))
    t("index-join candidates") { cand.count() }
    val pairs = cand.select("doc_id", "corpusId").distinct().localCheckpoint(true)
    t("distinct candidate pairs") { pairs.count() }
    t("verified matches") {
      pairs.join(withVec.select(col("doc_id"), col("v"), col("nrm")), "doc_id")
        .join(store, "corpusId")
        .select(round(graft.ops.Similarity.dot(col("v"), col("corpusV")) /
          (col("nrm") * col("corpusN")), 6).as("c"))
        .where(col("c") >= 0.6).count()
    }
    t("within-batch pairs") {
      graft.ops.Dedup.cosinePairsFromBanded(banded, withVec, 0.6).count()
    }
    t("within-batch CC") {
      graft.ops.Dedup.connectedComponentsStar(
        graft.ops.Dedup.cosinePairsFromBanded(banded, withVec, 0.6),
        "idA", "idB").count()
    }
    t("full dedupIncrementalCosine") {
      graft.ops.Dedup.dedupIncrementalCosine(vecBatch, index, store,
        "vec_id", "embedding", threshold = 0.6,
        planesPerBand = planes, bands = 8).count()
    }
    spark.stop()
  }
}
