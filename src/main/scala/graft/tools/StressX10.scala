package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-flight ×10 stress point for the heaviest dedup/cluster paths
  * (VERDICT r7 stretch #8): the driver caps testdata at sf0.1, so this
  * tool synthesizes a 10× corpus IN FLIGHT and times the three heaviest
  * candidate-generating operators on 1× vs 10× — one more scale point
  * for the sublinearity claims in BENCH_NOTES.
  *
  * The replication is shape-preserving, not a copy: replica `r` of a
  * document Caesar-rotates its letters by `r` (same lengths, same word
  * structure, DISJOINT shingle sets across replicas) and replica `r` of
  * an embedding multiplies each dimension by a deterministic ±1 mask —
  * the SAME mask on both sides of a pair leaves every same-replica
  * cosine exactly unchanged (s² = 1 per dim), while cross-replica dots
  * cancel to ~0 under the product of independent masks. (A dimension
  * ROTATION does not work: it preserves each vector's autocorrelation,
  * so the 10 rotations of one vector are near-dups of each other — a
  * first attempt measured 101× pairs at 10× data that way.) A naive
  * duplicate-copy ×10 would square every duplicate cluster (×100 pairs)
  * and measure the data's pathology, not the operator's scaling; with
  * the masks, pair counts scale ~linearly with data, which is the
  * workload shape the claims are about. Ids are salted into disjoint
  * ranges per replica.
  *
  * Usage: `sbt "runMain graft.tools.StressX10 /root/testdata/sf0.1"`;
  * results go to stdout as a markdown table for BENCH_NOTES.
  */
object StressX10 {


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

    def replicate(df: DataFrame, idCol: String, mutate: (Column, Column) => Column,
        payloadCol: String): DataFrame =
      df.select(col(idCol), col(payloadCol),
          explode(sequence(lit(0), lit(9))).as("rep"))
        .select((col(idCol) + col("rep").cast("long") * 10000000L).as(idCol),
          mutate(col(payloadCol), col("rep")).as(payloadCol))
        .localCheckpoint() // materialize: time the operator, not generation

    // replication rules live in Synth (one definition across the tools)
    val caesar: (Column, Column) => Column = (text, rep) =>
      Synth.caesarByRep(text, rep, 10)
    val signMask: (Column, Column) => Column = (v, rep) =>
      Synth.maskByRep(v, rep, 10)

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val docs10 = replicate(docs1, "doc_id", caesar, "text")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val emb10 = replicate(emb1, "vec_id", signMask, "embedding")
    println(s"docs ${docs1.count()} -> ${docs10.count()}; " +
      s"emb ${emb1.count()} -> ${emb10.count()}")

    // dominant-stratum harness for the exact-n samplers: ~95% of rows in
    // ONE stratum ("web"), the rest across 5 rare strata — the real
    // mixture-job shape where a per-stratum rank window used to serialize
    // the dominant source through a single task
    // rare index derives from id/20, NOT id%5: every id with id%20 == 0
    // is divisible by 5, so id%5 would collapse all rare rows into
    // "rare0" and the harness would run with 2 strata instead of 6
    def addStrata(df: DataFrame, idCol: String): DataFrame =
      df.withColumn("strata",
        when(pmod(col(idCol), lit(20)) === 0,
          concat(lit("rare"), pmod((col(idCol) / lit(20)).cast("long"), lit(5))))
          .otherwise(lit("web")))
    val strat1 = addStrata(docs1, "doc_id").localCheckpoint()
    val strat10 = addStrata(docs10, "doc_id").localCheckpoint()
    // the pre-r9 shape, kept here as the contrast row: rank the FULL
    // corpus in a window partitioned by stratum (parallelism = #strata)
    def naiveStratified(df: DataFrame, n: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("strata"))
        .orderBy(graft.ops.Sampling.unitHash(col("doc_id")), col("doc_id"))
      df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
    }

    // multi-line page chrome for the boilerplate-removal row (the corpus
    // itself is single-line word salad): shared nav/cookie lines + a
    // 7-variant promo + a unique signature, as in the d_boilerplate query
    def addChrome(df: DataFrame): DataFrame =
      df.withColumn("text", concat(
        lit("HOME | ABOUT | CONTACT\nThis site uses cookies.\n"), col("text"),
        lit("\nPROMO CODE "), pmod(col("doc_id"), lit(7)).cast("string"),
        lit("\ndoc "), col("doc_id").cast("string")))
    val bl1 = addChrome(docs1).localCheckpoint()
    val bl10 = addChrome(docs10).localCheckpoint()

    // aligned 80-char license header on 95% of docs: its two full windows
    // ([0,60) and [20,80)) are HUB passage hashes with df ≈ corpus — the
    // redaction operator's no-df-ceiling worst case (headers are added
    // AFTER Caesar replication, so they stay identical across replicas
    // and hub df scales with the corpus)
    val licHeader = "LICENSE: Creative Commons Attribution 4.0 International. Redistribution allowed."
      .padTo(80, '-')
    def addHeader(df: DataFrame): DataFrame =
      df.withColumn("text",
        when(pmod(col("doc_id"), lit(20)) =!= 0, concat(lit(licHeader), col("text")))
          .otherwise(col("text")))
    val hub1 = addHeader(docs1).localCheckpoint()
    val hub10 = addHeader(docs10).localCheckpoint()

    // (source, shingle-hash) rows for the KMV sketch scenario — source
    // derived from the id so replicas spread across the 20 groups
    def shingleRows(df: DataFrame): DataFrame =
      df.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        .select(col("source"),
          explode(graft.functions.TextFunctions.shingle_hashes(col("text"))).as("h"))
        .localCheckpoint()
    val docs1w = shingleRows(docs1)
    val docs10w = shingleRows(docs10)

    // seeded coarse quantizer for the SemDeDup scenarios: the k
    // smallest-id vectors as centroids (deterministic, shared by 1x/10x)
    def seedCents(d: DataFrame, k: Int): DataFrame =
      d.where(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("centId"),
          transform(col("embedding"), x => x.cast("double")).as("cent_v"))
        .withColumn("cent_n", graft.ops.Similarity.norm(col("cent_v")))

    // steady-state incremental-dedup fixtures (scenario below): probe
    // batch fixed, persisted index 1x vs 10x, both materialized up front
    val probeBatch = docs1.where(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val ssIdx1 = graft.ops.Dedup.simhashIndex(docs1, "doc_id", "text")
      .localCheckpoint()
    val ssIdx10 = graft.ops.Dedup.simhashIndex(docs10, "doc_id", "text")
      .localCheckpoint()
    // cosine steady-state fixtures: fixed probe batch (ids shifted clear
    // of every index id), band index + vector store at both corpus sizes
    val vecBatch = emb1.where(pmod(col("vec_id"), lit(10)) === 3)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val csIdx1 = graft.ops.Dedup.cosineIndex(emb1, "vec_id", "embedding")
      .localCheckpoint()
    val csIdx10 = graft.ops.Dedup.cosineIndex(emb10, "vec_id", "embedding")
      .localCheckpoint()
    val csStore1 = graft.ops.Dedup.cosineVecStore(emb1, "vec_id", "embedding")
      .localCheckpoint()
    val csStore10 = graft.ops.Dedup.cosineVecStore(emb10, "vec_id", "embedding")
      .localCheckpoint()

    // passage-criterion steady-state fixtures: fixed probe batch (10% of
    // 1x, ids shifted clear of every index id), distinct-hash index at
    // both corpus sizes, built OUTSIDE the timed op (amortized across
    // batches in production, like ssIdx/csIdx above)
    val ppBatch = docs1.where(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val ppIdx1 = graft.ops.Dedup.passageHashIndex(docs1, "doc_id", "text")
      .localCheckpoint()
    val ppIdx10 = graft.ops.Dedup.passageHashIndex(docs10, "doc_id", "text")
      .localCheckpoint()

    // sketch steady-state fixtures: fixed probe batch, sketches built over
    // the 1x vs 10x corpora OUTSIDE the timed op (built once per
    // shard/day in production). The sketches are FIXED-SIZE — the Bloom
    // bit table is mBits/32 rows and the CMS is depth·width cells no
    // matter the corpus — so the serve-side claim is stronger than the
    // index families': probe cost must be corpus-INDEPENDENT (ratio ~1.0
    // with identical plans, not merely sublinear)
    val fpBatch = docs1.where(pmod(col("doc_id"), lit(10)) === 3)
      .select(col("doc_id"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
      .localCheckpoint()
    val bloom1 = graft.ops.Sketch.bloomSketch(
        docs1.select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp")),
        col("fp"), mBits = 1 << 20, kHashes = 4)
      .localCheckpoint()
    val bloom10 = graft.ops.Sketch.bloomSketch(
        docs10.select(graft.ops.TextAnalysis.fingerprint(col("text")).as("fp")),
        col("fp"), mBits = 1 << 20, kHashes = 4)
      .localCheckpoint()
    // shingle (3-gram) keys, not words: the word-salad corpus has a tiny
    // closed vocabulary, but shingles number in the hundreds of thousands
    // — the realistic heavy-hitter-n-gram key population
    val wKeys = docs1.where(pmod(col("doc_id"), lit(10)) === 3)
      .select(explode(graft.functions.TextFunctions.shingle_hashes(col("text")))
        .as("h")).distinct()
      .localCheckpoint()
    val cms1 = graft.ops.Sketch.cmsSketch(
        docs1.select(explode(
          graft.functions.TextFunctions.shingle_hashes(col("text"))).as("h")),
        col("h"), depth = 4, width = 1 << 15)
      .localCheckpoint()
    val cms10 = graft.ops.Sketch.cmsSketch(
        docs10.select(explode(
          graft.functions.TextFunctions.shingle_hashes(col("text"))).as("h")),
        col("h"), depth = 4, width = 1 << 15)
      .localCheckpoint()

    val cdcIdx1 = graft.ops.Dedup.cdcChunkIndex(docs1, "doc_id", "text",
        k = 16, maskBits = 6)
      .localCheckpoint()
    val cdcIdx10 = graft.ops.Dedup.cdcChunkIndex(docs10, "doc_id", "text",
        k = 16, maskBits = 6)
      .localCheckpoint()

    // optional arg 2: substring filter — run only matching scenarios and
    // skip the 160M-row locally{} points (fast iteration on one scenario)
    val only = args.drop(1).headOption

    val allScenarios: Seq[(String, DataFrame, DataFrame, DataFrame => DataFrame)] = Seq(
      // frequent-line removal: one line-keyed aggregate (map-side
      // combined, output bounded by lines/minDocs) + a broadcast scan
      // filter — expect ~linear in corpus bytes
      ("d_boilerplate (clean, minDocs=25)", bl1, bl10,
        (d: DataFrame) => graft.ops.Boilerplate.clean(d, "doc_id", "text",
          minDocs = 25)),
      // two-phase exact-n: the rank window sees ~n + avail/4096 rows per
      // stratum, so 10× data should cost ~the extra histogram scan, and
      // the dominant stratum must NOT serialize
      ("d_sample_stratified (two-phase, n=1000)", strat1, strat10,
        (d: DataFrame) => graft.ops.Sampling.stratifiedFixed(d, "strata", "doc_id", 1000)),
      ("d_sample_stratified (naive full-corpus window, contrast)", strat1, strat10,
        (d: DataFrame) => naiveStratified(d, 1000)),
      ("d_dedup_ngram", docs1, docs10,
        (d: DataFrame) => graft.ops.Dedup.ngramJaccardPairs(d, "doc_id", "text",
          threshold = 0.1, maxDf = 100)),
      ("d_dedup_clusters_star", docs1, docs10,
        (d: DataFrame) => graft.ops.Dedup.connectedComponentsStar(
          graft.ops.Dedup.minhashLshPairs(d, "doc_id", "text",
            numHashes = 32, bands = 8, threshold = 0.3), "idA", "idB")),
      // the composed daily increment (r10's most expensive row): index the
      // even-id half, grow by the odd-id half — cost should track the CC
      // family (its dominant stage), not corpus²
      ("d_dedup_simhash_incremental (index=half)", docs1, docs10,
        (d: DataFrame) => {
          val idx = graft.ops.Dedup.simhashIndex(
            d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
          graft.ops.Dedup.dedupIncrementalNear(
            d.where(pmod(col("doc_id"), lit(2)) === 1), idx, "doc_id", "text")
        }),
      // VERDICT r10 item 8 — the STEADY-STATE regime of a mature corpus:
      // the daily batch is FIXED (10% of the 1x corpus, ids shifted clear
      // of every index id) while the persisted simhash index grows 1x→10x.
      // Index build is OUTSIDE the timed op (it is amortized across many
      // batches in production); what is timed is probe + within-batch CC +
      // anti-join. The claim: the within-batch stages are index-size-
      // independent, so 10× index costs only the bigger band-join side —
      // the ratio should sit well under the index growth factor.
      // CDC ingest probe steady-state: the chunk-identity index GROWS
      // with the corpus (unlike the Bloom/CMS tables), but the probe is
      // one hash-keyed join of fixed batch chunks against it — cost
      // should track the join build side sublinearly, like the passage
      // probe
      ("cdcIndexMatches steady-state (fixed batch, chunk index 1x->10x)",
        cdcIdx1, cdcIdx10,
        (ix: DataFrame) => graft.ops.Dedup.cdcIndexMatches(probeBatch, ix,
          "doc_id", "text", k = 16, maskBits = 6, indexIsDistinct = true)),
      // Bloom serve: the bit table is mBits/32 rows at ANY corpus size,
      // so a 10x corpus changes ONLY the bit density, not one byte of
      // I/O — the probe must be flat at 1.0x by construction
      ("bloomProbe steady-state (fixed batch, corpus 1x->10x, FIXED-SIZE filter)",
        bloom1, bloom10,
        (sk: DataFrame) => graft.ops.Sketch.bloomProbe(fpBatch, "doc_id",
          col("fp"), sk, mBits = 1 << 20, kHashes = 4)),
      // CMS serve: same fixed-size claim for the counter table — lookups
      // join depth rows per key against <= depth*width cells
      ("cmsLookup steady-state (fixed probe keys, corpus 1x->10x, FIXED-SIZE counters)",
        cms1, cms10,
        (ck: DataFrame) => graft.ops.Sketch.cmsLookup(wKeys, "h", col("h"),
          ck, depth = 4, width = 1 << 15)),
      // histogram sketch BUILD: one row-local bucket map + one map-side-
      // combined count — the linear-in-corpus floor (like the KMV build),
      // with output bounded at groups*64 rows
      // docs1 carries only (doc_id, text): derive the 20 groups from the
      // id (replicas spread across them) and sketch the text length
      ("histSketch build+quantiles (corpus 1x->10x — linear floor)",
        docs1, docs10,
        (d: DataFrame) => graft.ops.Sketch.histQuantiles(
          graft.ops.Sketch.histSketch(
            d.withColumn("source",
              concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
              .withColumn("n_chars", length(col("text")).cast("long")),
            "source", "n_chars", lo = 0L, hi = 1024L, nBuckets = 64),
          "source", Seq(50, 90, 99), lo = 0L, hi = 1024L, nBuckets = 64)),
      ("dedupIncrementalNear steady-state (fixed batch, index 1x->10x)",
        ssIdx1, ssIdx10,
        (idx: DataFrame) => graft.ops.Dedup.dedupIncrementalNear(
          probeBatch, idx, "doc_id", "text")),
      // the cosine criterion's steady-state point (completing VERDICT r10
      // item 8 across criteria): fixed embedding batch, hyperplane-band
      // index + vector store grown 1x->10x, BOTH built outside the timed
      // op (amortized across batches in production, like ssIdx above);
      // the claim is the same — the within-batch stages are index-size-
      // independent and the probe stays an id-only band join plus
      // candidate-id vector lookups
      ("dedupIncrementalCosine steady-state (fixed batch, index 1x->10x)",
        csIdx1, csIdx10,
        (idx: DataFrame) => {
          val store = if (idx eq csIdx1) csStore1 else csStore10
          graft.ops.Dedup.dedupIncrementalCosine(vecBatch, idx, store,
            "vec_id", "embedding", threshold = 0.4)
        }),
      // SemDeDup cell-size control: with the quantizer FIXED at k=16, 10×
      // corpus → ~100× within-cell pair candidates (cells don't multiply);
      // growing k with the corpus (k = n/125 — 16 cells at 1x, 160 at 10x,
      // the SemDeDup paper's regime) keeps cells task-sized and the pair
      // stage ~linear. Seeded centroids (k smallest-id vectors, present in
      // both frames) keep the two runs deterministic and comparable.
      ("d_dedup_semantic (k=16 FIXED)", emb1, emb10,
        (d: DataFrame) => graft.ops.Dedup.semanticDedup(d, "vec_id", "embedding",
          seedCents(d, 16), 0.3)),
      ("d_dedup_semantic (k = n/125, grows with corpus)", emb1, emb10,
        (d: DataFrame) => graft.ops.Dedup.semanticDedup(d, "vec_id", "embedding",
          seedCents(d, math.max((d.count() / 125L).toInt, 16)), 0.3)),
      // the GATED parameterization: threshold 0.3 admits ~0.6% of ALL
      // pairs on this synthetic distribution (measured: p90 raw cosine
      // 0.16, max 0.38 on a sample), so OUTPUT is Θ(n²) by data, not by
      // algorithm — expect ~100× pairs at 10× data; the claim to check is
      // that runtime tracks pairs (the true work), not corpus²
      ("d_dedup_cosine_lsh (gated, thr 0.3)", emb1, emb10,
        (d: DataFrame) => graft.ops.Dedup.cosineNearDupPairs(d, "vec_id", "embedding",
          threshold = 0.3, planesPerBand = 4, bands = 8)),
      // the realistic NEAR-DUP operating point: sparse output (threshold
      // 0.9) and the matching candidate cut (8 planes/band = 256 buckets —
      // the "buckets too big → add planes" playbook from the Similarity
      // scaladoc); here runtime should scale ~linearly with data
      ("d_dedup_cosine_lsh (near-dup, thr 0.9, 8 planes)", emb1, emb10,
        (d: DataFrame) => graft.ops.Dedup.cosineNearDupPairs(d, "vec_id", "embedding",
          threshold = 0.9, planesPerBand = 8, bands = 8)),
      // corpus-wide first-occurrence line dedup: the chrome lines are HUB
      // lines (every doc carries them), so the stress is the min(struct)
      // first-occurrence aggregate — it partial-combines map-side, so the
      // line-keyed shuffle sees one row per (map task, line); expect
      // ~linear in corpus bytes like the boilerplate aggregate above
      ("d_dedup_lines_across (hub chrome lines)", bl1, bl10,
        (d: DataFrame) => graft.ops.Boilerplate.dedupLinesAcross(d, "doc_id", "text")),
      // exact-substring redaction under hub windows: two passage hashes
      // carry df ≈ 0.95 × corpus, and redaction has NO df ceiling by
      // design (the license header is exactly what must be cut). The
      // dup-hash aggregate partial-combines map-side (1 row per hash
      // out), so the dup table stays tiny and the occurrence join never
      // funnels the hub's occurrence list through one task — expect
      // ~linear in corpus bytes
      // the trailing coalesce-filter is always true but NOT foldable, so
      // count() cannot prune the kept_text rebuild out of the plan (the
      // noop-sink lesson: time the work, not the pruned skeleton)
      ("d_dedup_passages_redact (hub header on 95% of docs)", hub1, hub10,
        (d: DataFrame) => graft.ops.Dedup.redactRepeatedPassages(
            d, "doc_id", "text")
          .where(coalesce(length(col("kept_text")), lit(0)) >= 0)),
      // the passage criterion's steady-state point (the family's
      // convention: fixed batch, index 1x->10x, builds amortized): the
      // within-batch stages are index-size-independent and the probe is
      // a hash-keyed join whose bigger side ships one long per distinct
      // window — expect ~flat; kept_text rebuild forced as in the hub row
      ("redactRepeatedPassagesIncremental steady-state (fixed batch, index 1x->10x)",
        ppIdx1, ppIdx10,
        (idx: DataFrame) => graft.ops.Dedup.redactRepeatedPassagesIncremental(
            ppBatch, idx, "doc_id", "text")
          .where(coalesce(length(col("kept_text")), lit(0)) >= 0)),
      // winnowing under hub fingerprints: the license header's selected
      // fingerprints carry df ≈ 0.95 × corpus and MUST die in the
      // [2, maxDf] prune before pair expansion — expect ~linear, like
      // the ngram row (same inverted-index shape, winnow selection cost)
      ("d_dedup_winnow (hub header on 95% of docs)", hub1, hub10,
        (d: DataFrame) => graft.ops.Dedup.winnowedPassagePairs(
          d, "doc_id", "text")),
      // KMV distinct sketch at 10x: the distinct + histogram + tiny rank
      // stages are all map-side combined or bucket-bounded — expect
      // ~linear in corpus bytes, and the per-group rank window input
      // stays ≈ k + one bucket regardless of corpus size
      ("d_distinct_sketch (per-source shingles)", docs1w, docs10w,
        (d: DataFrame) => graft.ops.Sketch.kmvDistinct(
          d, "source", org.apache.spark.sql.functions.col("h"))),
      // est-Jaccard composed increment, mirroring the simhash scenario:
      // cost should track the CC family, not corpus²
      ("d_dedup_minhash_incremental (index=half)", docs1, docs10,
        (d: DataFrame) => {
          val idx = graft.ops.Dedup.minhashIndex(
            d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
          graft.ops.Dedup.dedupIncrementalMinhash(
            d.where(pmod(col("doc_id"), lit(2)) === 1), idx, "doc_id", "text")
        }),
      // DSIR estimate → weights → top-n, end-to-end: the estimator is one
      // bucket-keyed aggregate (≤1024 rows out), scoring is scan-
      // throughput, the cut is TakeOrdered — expect ~linear
      ("d_dsir_sample (estimate+select, n=1000)", docs1, docs10,
        (d: DataFrame) => {
          val labeled = d.withColumn("is_target",
            pmod(col("doc_id"), lit(3)) === 0)
          val w = graft.ops.Classifier.packWeights(
            graft.ops.Classifier.dsirLogRatios(labeled, "text", "is_target"),
            "lr_micro")
          graft.ops.Classifier.dsirTopN(d, "doc_id", "text", w.toSeq, 1000)
        }),
      // SQ8 exhaustive ranking with a FIXED 20-query side: the ranges
      // aggregate and the decode are linear in corpus, the ranking cross
      // join is queries × corpus — expect ~linear at fixed query count
      ("s_ann_sq8 (fixed 20 queries)", emb1, emb10,
        (d: DataFrame) => graft.ops.Similarity.sq8TopK(
          emb1.where(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("embedding").as("vec")),
          d.select(col("vec_id").as("cid"), col("embedding").as("vec")),
          k = 5, refine = 30)),
      // winnow REMOVAL end to end (VERDICT r11 item 7): pairs → star-CC →
      // one LEFT ANTI. The claim: cost ≈ clusters_star + the winnow pair
      // stage — CC-dominated, so the 10× ratio should track the
      // d_dedup_clusters_star row above, not corpus²
      ("d_dedup_winnow_removal (pairs -> star-CC -> anti-join)", docs1, docs10,
        (d: DataFrame) => {
          val pairs = graft.ops.Dedup.winnowedPassagePairs(d, "doc_id", "text",
            k = 30, w = 10, maxDf = 50, minShared = 2)
          val comps = graft.ops.Dedup.connectedComponentsStar(pairs, "idA", "idB")
          val losers = comps.where(col("node") =!= col("comp"))
            .select(col("node").as("__dup_id"))
          d.join(losers, d("doc_id") === col("__dup_id"), "left_anti")
        }),
      // the frozen-set redaction serve under a 10× BENCHMARK SET (the
      // broadcast-array ceiling, VERDICT r11 item 7): corpus FIXED, the
      // sorted gram array grows 10× (Caesar replicas of the bench docs
      // have disjoint gram sets). The serve is a zero-exchange codegen
      // binary search, so the expected cost is ~log(10×) per token plus
      // the one-off driver collect of the bigger set — near-flat
      ("redactSpansServe (fixed corpus, bench set 1x->10x)",
        docs1.where(col("doc_id") < 100).localCheckpoint(),
        docs10.where(pmod(col("doc_id"), lit(10000000L)) < 100).localCheckpoint(),
        (b: DataFrame) => {
          val set = graft.ops.Decontaminate.benchGramSet(b, "text")
          graft.ops.Decontaminate.redactSpansServe(docs1, set, "text",
              n = 3, minFragmentWords = 10)
            .where(coalesce(length(col("kept_text")), lit(0)) >= 0)
        }),
      // image dHash dedup at 10×: the near-dup PNG fixture generates
      // payloads from the ID (groups of 4 per id/4), so the shifted-id
      // replica set is a GENUINE 10× image corpus with the same group
      // structure. Decode is partition-local, pairing is blocked —
      // expect ~linear decode plus the pair growth the data carries
      ("m_media_dedup (decode + blocked pairing)", docs1, docs10,
        (d: DataFrame) => graft.ops.Dedup.pairsFromHash(
          graft.ops.Multimodal.imageHashes(
            graft.ops.Multimodal.imageDedupAssets(d)),
          maxHamming = 4, blocks = 5, bits = 64)),
      // TOKEN-budgeted mixture under the 95%-dominant stratum (VERDICT
      // r11 item 7): the bucketed prefix sums must keep the dominant
      // source's running-token window off a single task — expect ~linear
      // in corpus, like the stratified two-phase row
      ("d_mixture_tokens (95%-dominant source)",
        addStrata(docs1, "doc_id")
          .withColumn("nTokens", graft.ops.TextAnalysis.wsTokenCount(col("text")))
          .localCheckpoint(),
        addStrata(docs10, "doc_id")
          .withColumn("nTokens", graft.ops.TextAnalysis.wsTokenCount(col("text")))
          .localCheckpoint(),
        (d: DataFrame) => graft.ops.Sampling.mixtureSampleTokens(
          d, "strata", "doc_id", "nTokens",
          Map("web" -> 3.0, "rare0" -> 1.0), default = 0.5)),
    )
    val scenarios = only.map(f => allScenarios.filter(_._1.contains(f)))
      .getOrElse(allScenarios)

    def time(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // min of 2 interleaved passes (the repo's standard minima protocol)
    val results = (1 to 2).map { _ =>
      scenarios.map { case (name, one, ten, op) =>
        val (t1, n1) = time(op(one))
        val (t10, n10) = time(op(ten))
        (name, t1, n1, t10, n10)
      }
    }
    // Dominant-stratum serialization measure at 160M rows (~3000× the
    // sf0.1 corpus, 95% in one stratum). Wall time on THIS box is not the
    // honest metric: a 32-core 32 GB JVM sorts 152M longs in one in-memory
    // task without breaking a sweat, so the naive form stays competitive
    // locally — the wall it hits is a cluster's, where a window partition
    // is ONE task on ONE core with one spill disk and the dominant
    // stratum of a 100 TB mixture is ~95 TB through it. The
    // cluster-independent measure is the rank window's INPUT cardinality:
    // naive = the full corpus in #strata tasks; two-phase = the bucket
    // survivors (≈ n + avail/4096 per stratum), a ~1000× reduction that
    // the per-task ceiling inherits directly. Both are printed; membership
    // equality is asserted.
    if (only.isEmpty) locally {
      // NOT checkpointed: range generation is a few hundred ms and both
      // forms pay it identically (materializing 160M rows OOMs the heap)
      val big = addStrata(
        spark.range(0, 160000000L).select(col("id").as("doc_id")), "doc_id")
      val (tTwo, nTwo) = time(
        graft.ops.Sampling.stratifiedFixed(big, "strata", "doc_id", 1000))
      val (tNaive, nNaive) = time(naiveStratified(big, 1000))
      require(nTwo == nNaive, s"$nTwo vs $nNaive")
      val winRows = graft.ops.Sampling.rankWindowInputRows(big, "strata", "doc_id", 1000)
      println(f"| stratifiedFixed 160M rows 95%%-dominant | two-phase $tTwo%.2f s, " +
        f"rank-window input $winRows rows across strata-many tiny tasks " +
        f"| naive window $tNaive%.2f s locally, rank-window input 160000000 rows " +
        f"(152M of them ONE task) | window-input ratio ${160000000.0 / winRows}%.0f× |")
      // the VERDICT r9 #8 point: force 64 shards and MEASURE the per-task
      // ceiling both forms would hand a cluster — the naive form's busiest
      // task is the dominant stratum no matter the shard count (a window
      // partition never splits), the two-phase form's is presample-sized
      val (twoMax, naiveMax) = graft.ops.Sampling.rankWindowTaskCeiling(
        big, "strata", "doc_id", 1000, numShards = 64)
      println(f"| stratifiedFixed 160M, 64 forced shards | two-phase busiest " +
        f"task $twoMax rows | naive busiest task $naiveMax rows | per-task " +
        f"ceiling ratio ${naiveMax.toDouble / twoMax}%.0f× |")
    }

    // Hub-key exact dedup (VERDICT r10 §wrong-1): 95% of 160M rows share
    // ONE content key — the boilerplate-page-in-a-crawl shape. The min_by
    // AGGREGATE partial-combines map-side, so the shuffle sees one row per
    // (map task, key); the old row_number window serialized the whole hub
    // group through one task. Local wall time under-states the difference
    // (one in-memory task absorbs the hub here); the cluster-independent
    // measure is the busiest post-shuffle task's input rows under 64
    // forced shards — the window's is bounded BELOW by the hub group, the
    // aggregate's by its map-side-combined output.
    if (only.isEmpty) locally {
      val hub = addStrata(
        spark.range(0, 160000000L).select(col("id").as("doc_id")), "doc_id")
        .withColumn("key",
          when(col("strata") === "web", lit("HUB"))
            .otherwise(concat(lit("k"), col("doc_id").cast("string"))))
        .select("doc_id", "key")
      val (tAgg, nAgg) = time(graft.ops.Dedup.exactDedup(hub, col("key"), "doc_id"))
      def naiveWindowDedup(d: DataFrame): DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("key")).orderBy(col("doc_id"))
        d.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
      }
      val (tWin, nWin) = time(naiveWindowDedup(hub))
      require(nAgg == nWin, s"membership drift: $nAgg vs $nWin")
      def maxTask(d: DataFrame): Long =
        d.repartition(64, col("key"))
          .select(spark_partition_id().as("__p"))
          .groupBy("__p").agg(count(lit(1)).as("__c"))
          .agg(max("__c")).first().getLong(0)
      // the map-side-combine output the aggregate's shuffle actually ships:
      // one row per (input partition, key)
      val partial = hub
        .groupBy(spark_partition_id().as("__mp"), col("key"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id", "key")
      println(f"| exactDedup 160M rows, 95%% hub key | min_by aggregate $tAgg%.2f s " +
        f"| naive window $tWin%.2f s locally | busiest shuffle-task input: " +
        f"aggregate ${maxTask(partial)} rows vs window ${maxTask(hub)} rows |")
    }

    println("| operator | 1x sec | 1x rows | 10x sec | 10x rows | time ratio |")
    println("|---|---|---|---|---|---|")
    scenarios.indices.foreach { i =>
      val name = scenarios(i)._1
      val t1 = results.map(_(i)._2).min
      val t10 = results.map(_(i)._4).min
      val (n1, n10) = (results.head(i)._3, results.head(i)._5)
      println(f"| $name | $t1%.2f | $n1 | $t10%.2f | $n10 | ${t10 / t1}%.1f× |")
    }

    // The broadcast→shuffle crossover on the steady-state probe: AQE picks
    // the strategy for the batch-fingerprints ⋈ index join from runtime
    // stats — report what it actually chose at each index size (on a real
    // cluster the index side keeps growing, so the expected end state is
    // batch-side broadcast or, past both thresholds, a shuffle join that
    // moves only fingerprint-sized rows; never a forced index broadcast).
    Seq(("1x", ssIdx1), ("10x", ssIdx10)).foreach { case (label, idx) =>
      val probed = graft.ops.Dedup.simhashIndexMatches(
        probeBatch, idx, "doc_id", "text")
      probed.write.format("noop").mode("overwrite").save()
      val plan = probed.queryExecution.executedPlan.toString
      val shape =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else if (plan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
        else "other"
      println(s"| steady-state probe join strategy, index $label | $shape (AQE final) |")
    }
    spark.stop()
  }
}
