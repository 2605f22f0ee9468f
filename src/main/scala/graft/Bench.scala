package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * A warm-up job runs first so JVM/executor startup (~20 s in this VM — see
  * .claude/skills/verify/SKILL.md) isn't charged to the first query.
  */
object Bench {

  /** Representative slice of the inventory: scan+agg, star join, semi join,
    * filters, engine-routed paths, and the LLM-pipeline operators.
    */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", // full-scan groupBy agg (Q1)
    "q3_top_revenue",     // 3-way join + agg + top-k
    "q4_exists",          // semi join
    "q5_filter_project",  // pushdown filter + top-k
    "q8_star_join",       // 5-table star with broadcast dims
    "e_agg_groupby",      // engine-routed Q1
    "e_exists_count_ge",  // decorrelated counted EXISTS
    "e_join_transitive",  // engine 3-table join
    "q11_window_features", // per-user sequence windows over events
    "q13_jdbc_join",      // parquet fact × live-JDBC dim
    "q14_bucketed_join",  // co-located bucketed fact×fact join (no Exchange)
    "q15_partitioned_scan", // partition-dir pruning on the year-partitioned fact
    "d_text_analysis",    // HOF text pipeline
    "d_text_repetition",  // Gopher-style repetition signals (explode→count→max)
    "d_pipeline_prep",    // composed prep: quality→lang→dedup→token budget
    "d_pipeline_full",    // + decontaminate→sample→GLOBAL budget, one plan
    "d_pipeline_pack",    // gates→dedup→quantile→budget→packing, one plan
    "d_decontaminate",    // broadcast bench-shingle overlap vs the corpus
    "d_decontaminate_containment", // ratio-gated variant, same broadcast shape
    "d_dedup_clusters",   // minhash pairs → connected components (label prop)
    "d_dedup_clusters_star", // same via O(log n)-round large/small-star
    "d_dedup_passages",   // verbatim repeated-passage pairs (char windows)
    "d_sample_hash",      // deterministic Bernoulli sample (scan-stage filter)
    "d_sample_stratified", // exactly-n-per-stratum hash-ranked sample
    "d_budget_global",    // parallel-prefix-sum global admission budget
    "d_epoch_shards",     // deterministic per-epoch shuffle+shard
    "d_pack_sequences",   // concatenate-and-chunk packing offsets
    "d_quality_topq",     // exact top-quantile gate via value histogram
    "d_mixture_sample",   // weighted source mixture under availability
    "d_corpus_stats",     // per-source corpus profile report
    "d_text_surprisal",   // unigram self-surprisal quality signal
    "d_dedup_ngram",      // inverted-index jaccard
    "d_dedup_minhash",    // minhash LSH
    "d_dedup_simhash",    // simhash blocked Hamming
    "d_dedup_cosine_lsh", // banded hyperplane LSH + exact cosine
    "s_ann_topk",         // brute-force cosine top-k
    "s_ann_lsh",          // banded-LSH ANN
    "s_ann_lsh_probed",   // + query-side multi-probe (2 weakest-bit flips)
    "s_ann_ivf",          // IVF cell-probe ANN
    "s_ann_ivf_indexed",  // same probe against the persisted partitioned index
    "s_ann_ivf_trained",  // IVF with k-means-trained centroids (bench-only)
    "s_ann_ivf_trained_indexed", // trained + persisted: training amortized at build
    "s_ann_pq",           // product-quantization/ADC ANN (compression-only)
    "s_ann_ivfpq",        // IVF-routed PQ: ADC inside probed cells only
    "m_media_frames",     // mapPartitions frame sampling
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/executor warm-up

    // Bench-only rows: operators whose output is not DuckDB-oracle-
    // expressible (float-order-dependent k-means means) but whose cost the
    // driver should still see. Correctness for these is the OpsSpec recall
    // gate (trained ≥ seeded − ε, cell balance), not the hash oracle —
    // keeping SparkEntry.queries strictly the oracle-gated surface.
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "s_ann_ivf_trained" -> { (s, dir) =>
        import org.apache.spark.sql.functions.col
        val e = SparkEntry.t(s, dir, "embeddings")
        val corpus = e.select(col("vec_id").as("cid"), col("embedding").as("vec"))
        ops.Similarity.ivfTopK(
          e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("embedding").as("vec")),
          corpus, k = 5, nCells = 16, nProbe = 4,
          centroids = Some(ops.Similarity.kmeansCentroids(corpus, nCells = 16, iters = 5)))
          .orderBy("qid", "rank")
      },
      // trained + PERSISTED: the index (training + cell assignment) is built
      // once per JVM outside this lambda's second pass, so the min-of-passes
      // number is the pure serve-path cost — the amortized-index story
      // s_ann_ivf_trained's 3.4s/query training cost motivates
      "s_ann_ivf_trained_indexed" -> { (s, dir) =>
        import org.apache.spark.sql.functions.col
        val e = SparkEntry.t(s, dir, "embeddings")
        ops.Similarity.ivfTopKIndexed(
          e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("embedding").as("vec")),
          SparkEntry.trainedIvfIndex(s, dir), k = 5, nProbe = 4)
          .orderBy("qid", "rank")
      })
    val queries = SparkEntry.queries ++ extras
    val names = headline.filter(queries.contains)

    // One timed execution; Left(message) on failure. noop sink runs the
    // FULL plan (round 1's .count() let Catalyst prune aggregate
    // expressions and eliminate sorts — VERDICT.md §wrong-2).
    def runOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Left(String.valueOf(e.getMessage))
      }
    }

    // Host-scheduling noise on this VM migrates between queries from run to
    // run (BENCH_NOTES.md: identical code ranged 25-56 s total with the slow
    // spot moving); per-query MINIMA across interleaved passes are stable,
    // so run the whole set N times and keep each query's best. A query that
    // fails in every pass is reported as -1 (sentinel, excluded from total)
    // and listed under "failed" — never as a normal-looking timing.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val samples: Seq[Seq[(String, Either[String, Double])]] =
      (1 to passes).map(_ => names.map(n => n -> runOnce(n)))
    val best: Seq[(String, Option[Double])] = names.map { n =>
      val oks = samples.flatMap(_.collect { case (`n`, Right(s)) => s })
      n -> (if (oks.isEmpty) None else Some(oks.min))
    }
    val failed = best.collect { case (n, None) => n }
    val qs = best.map {
      case (k, Some(v)) => "\"" + k + f"""\":$v%.3f"""
      case (k, None)    => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val total = best.flatMap(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$passes,"agg":"min","queries":$qs$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
