package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measures the flat-vs-linear Spark-job-count separation of the
  * driver-local tokenizer merge loop (VERDICT r10 §wrong-2 fix): trains
  * BPE and WordPiece at the gated merge count and at 10×, printing wall
  * seconds and the number of Spark JOBS each run scheduled. Before the
  * rewrite every merge round cost one argmax job plus one checkpoint job
  * (so 10× merges ≈ 20× scheduler round-trips); after it, training
  * schedules the one distinct-word job regardless of merge count — the
  * property that makes a 32k-merge production vocabulary feasible.
  *
  * Usage: `sbt "runMain graft.tools.TrainerJobCount /root/testdata/sf0.1"`;
  * results go to stdout as a markdown table for BENCH_NOTES.
  */
object TrainerJobCount {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up

    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()

    println("| trainer | merges | sec | spark jobs |")
    println("|---|---|---|---|")
    def measure(label: String, merges: Int)(f: => Any): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      Thread.sleep(1000) // listener events are async; let the bus drain
      println(f"| $label | $merges | ${(System.nanoTime() - t0) / 1e9}%.2f " +
        s"| ${jobs.get() - j0} |")
    }
    for (m <- Seq(8, 80)) {
      measure("BPE", m)(graft.ops.Bpe.train(docs, "text", m))
      measure("WordPiece", m)(graft.ops.Bpe.trainWordPiece(docs, "text", m))
    }
    spark.stop()
  }
}
