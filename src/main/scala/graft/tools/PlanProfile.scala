package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): for each named
  * query, dump `.explain("formatted")` to `<outDir>/<name>.txt` and run
  * the query once against the noop sink under a SparkListener that
  * records per-job wall time and per-stage shuffle read/write bytes, so
  * the expensive *phase* of a multi-job operator (index build, CC
  * round, probe, final cut) is attributable without the UI.
  *
  * Usage: runMain graft.tools.PlanProfile <sfDir> <outDir> <name,name,...> [passes]
  */
object PlanProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 3) args(3).toInt else 1
    Files.createDirectories(Paths.get(outDir))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    final case class JobRec(id: Int, desc: String, var ms: Long,
        var shufReadMB: Double, var shufWriteMB: Double, var tasks: Long,
        var startedNs: Long)
    val jobs = mutable.ArrayBuffer[JobRec]()
    val live = mutable.Map[Int, JobRec]()
    val stageToJob = mutable.Map[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val r = JobRec(js.jobId, desc, 0L, 0.0, 0.0, 0L, System.nanoTime())
        live(js.jobId) = r
        js.stageIds.foreach(sid => stageToJob(sid) = r)
        jobs += r
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        live.remove(je.jobId).foreach(r => r.ms = (System.nanoTime() - r.startedNs) / 1000000L)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        stageToJob.get(sc.stageInfo.stageId).foreach { r =>
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            r.shufReadMB += m.shuffleReadMetrics.totalBytesRead / 1048576.0
            r.shufWriteMB += m.shuffleWriteMetrics.bytesWritten / 1048576.0
          }
          r.tasks += sc.stageInfo.numTasks
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val queries = graft.SparkEntry.queries
    for (name <- names) {
      val df = queries(name)(spark, sfDir)
      // plan text first (cheap, no execution)
      Files.writeString(Paths.get(outDir, s"$name.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      if (passes == 0) println(s"[profile] $name plan-only")
      var bestSec = Double.MaxValue
      var bestProfile = ""
      for (p <- 1 to passes) {
        jobs.synchronized { jobs.clear(); live.clear(); stageToJob.clear() }
        spark.sparkContext.setJobDescription(s"$name pass $p")
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener events drain
        val prof = jobs.synchronized {
          jobs.map(r => f"  job ${r.id}%4d ${r.ms}%6d ms  shufR ${r.shufReadMB}%8.2f MB  shufW ${r.shufWriteMB}%8.2f MB  tasks ${r.tasks}%4d")
            .mkString("\n")
        }
        val njobs = jobs.synchronized(jobs.size)
        println(f"[profile] $name pass $p: $sec%.3f s, $njobs jobs")
        if (sec < bestSec) { bestSec = sec; bestProfile = prof + s"\n  total ${f"$sec%.3f"} s, $njobs jobs" }
      }
      if (passes > 0) {
        Files.writeString(Paths.get(outDir, s"$name.profile.txt"), bestProfile + "\n")
        println(s"[profile] $name best ${f"$bestSec%.3f"} s -> $outDir/$name.profile.txt")
      }
    }
    spark.stop()
  }
}
