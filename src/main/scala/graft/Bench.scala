package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * A warm-up job runs first so JVM/executor startup (~20 s in this VM —
  * slow futex handoffs, a measured host quirk; see BENCH_NOTES.md) isn't
  * charged to the first query.
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
    "d_line_repetition",  // within-doc duplicate-line stats, row-local sort
    "d_dedup_lines_within", // within-doc repeated-line REMOVAL, order kept
    "d_pii_scrub",        // regex redaction chain, one scan-stage projection
    "d_bpe_train",        // 8 merge rounds over the distinct-word table
    "d_bpe_tokens",       // trained-tokenizer counts vs closed-form estimate
    "d_boilerplate",      // frequent-line removal, broadcast-set scan form
    "d_boilerplate_join", // same cut through the join+regroup scale form
    "d_boilerplate_by_source", // per-domain scope: (source, line) df keys
    "d_quality_classifier", // fused hashed-feature scoring, exchange-free
    "m_media_frames_wav", // byte-chunk sampler over genuine RIFF containers
    "d_pipeline_clean",   // boilerplate→PII→classifier→gates→dedup, one plan
    "d_top_ngrams",       // exact trigram mining, pruned top-k
    "d_corpus_labels",    // per (source, label) dataset-card crosstab
    "d_quality_rules",    // Gopher rule battery, integer-exact flags
    "d_quality_calibration", // classifier label × rule verdict agreement card
    "d_diverse_sample",   // trained-cell assignment → exact-n per cell
    "d_sample_weighted",  // survival probability = own quality score
    "d_dedup_incremental", // batch anti-join vs the accumulated key index
    "d_classifier_train",  // NB-style hashed-feature training, one aggregate
    "d_corpus_manifest",   // release manifest: counts + content hash folds
    "d_manifest_verify",   // backfill diff vs the released manifest
    "d_manifest_update",   // released + increment combined = full recompute
    "d_wordpiece_train",   // likelihood-scored tokenizer training, 8 rounds
    "d_wordpiece_tokens",  // WordPiece-trained counts through the shared segmenter
    "d_unigram_train",     // full hard-EM trainer run (the oracle-gated trainer)
    "d_tokenizer_fertility", // per-source tokens/word + chars/token card
    "d_embed_drift",       // per-dim snapshot centroid shift card
    "d_unigram_tokens",    // unigram-LM counts under the committed grid-exact model
    "d_unigram_ppl",       // CCNet-style per-doc NLL/token quality filter
    "d_tokenize_ids",      // terminal tokenization: per-doc token-ID sequences
    "d_pack_tokens",       // materialized 128-token training examples
    "d_classifier_trained", // train → weights → gate, end-to-end
    "d_dedup_simhash_vs_index", // batch near-dup probe of the corpus simhash index
    "d_dedup_minhash_vs_index", // est-Jaccard probe of the corpus MinHash band index
    "d_dedup_simhash_incremental", // near-dedup increment: index cut + touched components
    "d_dedup_minhash_incremental", // est-Jaccard increment: banded probe + touched components
    "d_dedup_lines_across",        // corpus-wide first-occurrence line dedup (CCNet paragraphs)
    "s_ann_sq8",                   // scalar-quantized ANN: byte codes, midpoint-decode ranking
    "s_ann_ivfsq8",                // IVF-routed SQ8: probed-cell scan, same codes
    "s_ann_sq8_indexed",           // persisted SQ8 serve: byte codes read from disk
    "d_dsir_sample",               // DSIR: estimate -> micro-nat weights -> top-n select
    "d_dsir_gate",                 // DSIR threshold gate (the streamable serving shape)
    "d_dedup_rates",               // per-source dedup-rate card over the removal closure
    "d_dedup_semantic_indexed",    // SemDeDup over the persisted cell-partitioned layout
    "d_decontaminate_redact",      // surgical span-level decontamination (GPT-3 style)
    "d_dedup_passages_redact",     // exact-substring passage redaction (Lee et al.)
    "d_decontaminate_redact_served", // frozen-set serve twin: join-free binary-search gate
    "d_length_buckets",            // power-of-two length buckets, padding-savings card
    "d_dedup_passages_incremental", // passage criterion's daily increment vs hash index
    "d_dedup_passage_rates",       // per-source passage-duplication triage card
    "d_dedup_passages_vs_index",   // passage probe of the corpus distinct-hash index
    "d_pack_eos",                  // EOS-separated packing (the pre-training stream shape)
    "d_mixture_epochs",            // repetition-aware per-source epoch upsampling
    "d_curriculum",                // equal-count quality-quantile training phases
    "d_pipeline_redact",           // composed: passage-redact -> kept-token admission
    "d_dedup_winnow",              // winnowing fingerprints: alignment-robust passage pairs
    "d_distinct_sketch",           // deterministic KMV distinct-count sketch vs exact
    "d_distinct_sketch_merged",    // per-shard sketches merged losslessly (mergeability)
    "d_distinct_sketch_ops",       // KMV set algebra: pairwise union/inter/Jaccard
    "d_text_surprisal2",           // bigram-interpolated LM surprisal (salted bigram join)
    "d_source_kl",                 // per-source KL-vs-corpus + entropy drift card
    "d_cdc_chunks",                // content-defined chunking: per-doc chunk cover
    "d_cdc_dedup",                 // per-source storage-dedup card (chunk store vs raw)
    "d_cdc_vs_index",              // incremental ingest probe vs persisted chunk index
    "d_cdc_pairs",                 // CDC near-dup criterion: df-pruned chunk-share pairs
    "d_cdc_removal",               // CDC pairs -> star-CC -> LEFT ANTI removal
    "d_cdc_incremental",           // chunk criterion's daily increment (incrementalCut)
    "d_dedup_criteria_matrix",     // cross-criterion pair-agreement governance card
    "q17_sessionize",              // gap-based sessionization over the event log
    "q18_funnel",                  // first-touch ordered conversion funnel
    "q19_retention",               // weekly retention cohorts
    "q20_transitions",             // event-type first-order Markov transition card
    "d_member_sketch",             // Bloom gate: build + probe + exact membership ride-along
    "d_member_sketch_merged",      // per-shard Bloom filters OR-merged (bit-identical)
    "d_freq_sketch",               // count-min word frequencies vs exact top-30
    "d_freq_sketch_merged",        // per-shard CMS sum-merged (cell-identical)
    "d_quantile_sketch",           // 64-bucket histogram quantiles per source
    "d_quantile_sketch_merged",    // per-shard histograms sum-merged (lossless)
    "d_dedup_winnow_removal",      // winnow pairs -> star-CC -> LEFT ANTI removal
    "d_length_quantiles",          // per-source exact p50/p90/p99 token-length profile
    "d_dedup_winnow_vs_index",     // winnow probe of the persisted fingerprint index
    "d_embed_project",             // JL sign projection 64->16 (deterministic planes)
    "s_ann_projected",             // ANN: project-then-rescore (16-dim candidate ranking)
    "s_ann_projected_indexed",     // same serve from the persisted projected table
    "d_dedup_cosine_vs_index", // embedding probe of the corpus hyperplane-band index
    "d_dedup_cosine_incremental", // semantic-dedup increment: cosine index cut + touched components
    "d_pipeline_prep",    // composed prep: quality→lang→dedup→token budget
    "d_pipeline_full",    // + decontaminate→sample→GLOBAL budget, one plan
    "d_pipeline_pack",    // gates→dedup→quantile→budget→packing, one plan
    "d_decontaminate",    // broadcast bench-shingle overlap vs the corpus
    "d_decontaminate_pairs", // per-(doc, bench item) attribution audit table
    "d_decontaminate_containment", // ratio-gated variant, same broadcast shape
    "d_dedup_clusters",   // minhash pairs → connected components (label prop)
    "d_dedup_clusters_star", // same via O(log n)-round large/small-star
    "d_dedup_removal",    // end-to-end removal: pairs → components → anti-join cut
    "d_dedup_removal_best", // same closure, longest-member representative (max_by per comp)
    "d_dedup_passages",   // verbatim repeated-passage pairs (char windows)
    "d_sample_hash",      // deterministic Bernoulli sample (scan-stage filter)
    "d_split_corpus",     // train/val/test split on inlined hash thresholds
    "d_split_manifest",   // per-split release manifests (split × shard)
    "d_split_decontam",   // train→test near-dup leakage removal
    "d_sample_stratified", // exactly-n-per-stratum hash-ranked sample
    "d_budget_global",    // parallel-prefix-sum global admission budget
    "d_epoch_shards",     // deterministic per-epoch shuffle+shard
    "d_pack_sequences",   // concatenate-and-chunk packing offsets
    "d_pack_examples",    // chunk-side packed spans (partition-local explode)
    "d_epoch_pack",       // epoch shuffle + per-shard packing (zero single-partition stages)
    "d_quality_topq",     // exact top-quantile gate via value histogram
    "d_mixture_sample",   // weighted source mixture under availability
    "d_mixture_temp",     // avail^tau weights through the exact-quota path
    "d_mixture_tokens",   // TOKEN-budgeted quotas via bucketed prefix sums
    "d_mixture_lang",     // language-balanced mixture over the DERIVED stratum
    "d_corpus_stats",     // per-source corpus profile report
    "d_text_surprisal",   // unigram self-surprisal quality signal
    "d_dedup_ngram",      // inverted-index jaccard
    "d_dedup_minhash",    // minhash LSH
    "d_dedup_simhash",    // simhash blocked Hamming
    "d_dedup_cosine_lsh", // banded hyperplane LSH + exact cosine
    "d_dedup_semantic",   // SemDeDup: trained cells + exact within-cell prune
    "d_semantic_cells",   // per-cell embedding-space dataset card
    "d_embed_normalize",  // mean-center + L2-normalize feature prep
    "d_bm25_search",      // BM25 top-10, TakeOrderedAndProject global cut
    "d_bm25_multi",       // query TABLE scored in one corpus pass
    "d_bm25_served",      // frozen-stats serve path, row-local term fold
    "d_tfidf_keywords",   // per-doc TF-IDF top-3, doc-partitioned rank window
    "d_source_overlap",   // exact pairwise source shingle Jaccard matrix
    "d_source_overlap_est", // MinHash min-of-mins estimate (one sig per source)
    "d_ann_negatives",    // ANCE-style hard-negative mining (label mismatch)
    "s_ann_topk",         // brute-force cosine top-k
    "s_ann_lsh",          // banded-LSH ANN
    "s_ann_lsh_probed",   // + query-side multi-probe (2 weakest-bit flips)
    "s_ann_ivf",          // IVF cell-probe ANN
    "s_ann_ivf_indexed",  // same probe against the persisted partitioned index
    "s_ann_ivf_trained",  // trained-quantizer serve path (committed fixture centroids)
    "s_ann_ivf_trained_indexed", // trained + persisted: assignment amortized at build
    "s_ann_ivf_sharded",  // sharded IVF: per-shard indexes, global re-rank (r18)
    "s_ann_ivf_sharded_indexed", // sharded serve: probed shard/cell dirs only
    "s_ann_ivf_sharded_trained", // trained per-shard quantizer (committed fixture, r19)
    "s_ann_ivf_sharded_trained_indexed", // trained + persisted sharded serve (r19)
    "s_ann_ivfpq_trained_indexed", // persisted IVF-PQ: stamped quantizers, pruned code scan
    "s_ann_pq",           // product-quantization/ADC ANN (compression-only)
    "s_ann_ivfpq",        // IVF-routed PQ: ADC inside probed cells only
    "s_ann_pq_trained",   // PQ serve path under the committed trained codebook
    "s_ann_ivfpq_trained", // fully-trained IVF-PQ: fixture quantizer + codebook
    "s_ann_ivfpq_residual", // IVFADC: residual codes + broadcast centroid term
    "m_media_frames",     // mapPartitions frame sampling
    "m_media_features",   // REAL PNG decode (ImageIO) + raster checksum
    "m_media_resize",     // real decode + nearest-neighbor resample
    "m_media_audio",      // REAL WAV decode (javax.sound) + energy/checksum
    "m_media_audio_frames", // windowed checksums over decoded samples
    "m_media_dedup",      // dHash-64 image near-dup via 64-bit blocked pairing
    "m_media_dedup_removal", // image pairs -> star-CC -> LEFT ANTI survivors
    "m_media_dedup_vs_index", // batch probe of the persisted image-hash index
    "m_media_audio_dedup", // audio energy-fingerprint near-dup pairing
    "m_media_video_dedup", // video chunk-energy near-dup (stub decode tier)
    "m_media_manifest",    // per-modality decoded dataset card
    "m_media_dedup_rates", // per-modality dup-rate triage card (3 closures)
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

    // Since r8 every headline name is an oracle-gated SparkEntry query —
    // the trained-IVF serve paths are gated on the committed centroid
    // fixture (the live Lloyd training job itself remains pinned by the
    // OpsSpec recall/parity gates; its one-off cost was measured in r7 at
    // 3.53 s/query vs 1.09 s served from the persisted index).
    val queries = SparkEntry.queries
    // local-iteration filter (comma-separated substrings); the driver
    // sets no env, so its invocation always runs the full headline set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = headline.filter(queries.contains)
      .filter(n => only.forall(_.exists(n.contains)))

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
    // Default 3 passes since r9: the shipped artifact follows the same
    // min-of-3 protocol BENCH_NOTES uses, so round-over-round comparisons
    // stop needing clean-rerun footnotes.
    // Noise canary (r18): ONE constant data-independent job — a fixed-size
    // range shuffle+agg — timed immediately before the first pass and
    // after the last. The pair quantifies this window's host-scheduling
    // inflation per artifact (the per-round regression analyses kept
    // re-attributing row elevations to host-minima migration by hand;
    // canary drift >~1.3× marks the window degraded, so row regressions
    // inside it are window noise until re-measured, not code).
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(8000000)
        .selectExpr("id % 9973 AS k", "id")
        .groupBy("k").sum("id")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // unrecorded: pay the canary plan's codegen/JIT once
    val canaryFirst = canaryOnce()
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val samples: Seq[Seq[(String, Either[String, Double])]] =
      (1 to passes).map(_ => names.map(n => n -> runOnce(n)))
    // Settle before the CLOSING canary so it measures the HOST WINDOW,
    // not the run's own tail (r19 diagnosis: after a full 170-row × 3
    // pass run the un-settled closing canary inflated 1.3-2.1× in five
    // consecutive windows whose OPENING canaries were all in band, while
    // a 1-row run showed zero tail inflation — the drift was accumulated
    // JVM state (GC debt, cleanup threads), i.e. self-load, which the
    // canary exists to EXCLUDE from window attribution). GC + a short
    // pause + one unrecorded re-warm (symmetric with the opening pair)
    // puts the closing measurement on the same footing as the opening.
    System.gc()
    Thread.sleep(8000)
    canaryOnce() // unrecorded re-warm, symmetric with the opening canary
    val canaryLast = canaryOnce()
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
    val canaryJson =
      f""","canary":{"first":$canaryFirst%.3f,"last":$canaryLast%.3f}"""
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$passes,"agg":"min","queries":$qs$failedJson$canaryJson,"sf":"$sfDir"}"""
    println(line)
    // The collector keeps only a bounded TAIL of stdout, which truncates
    // the ~4 KB per-query map mid-JSON — so ALSO persist the complete line
    // as a file next to the build (cwd = repo root under sbt), where the
    // round artifacts pick it up with all rows intact.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
