package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-style document
  * gate (Joulin et al. 2016; the CCNet/LLaMA pipelines score pages with
  * exactly this model family): each word hashes into one of `numBuckets`
  * feature buckets, the document's score is the mean bucket weight, and
  * the label is a threshold cut on that mean. [[TextAnalysis.qualityScore]]
  * is a hand-written heuristic; this is the LEARNED-model surface — the
  * weight table is a model artifact, the scoring kernel is the operator.
  *
  * The committed weight table is DETERMINISTIC (a Lehmer mix of the bucket
  * id) rather than trained: training happens offline (the IVF-centroid
  * fixture precedent — tools/TrainIvfFixture); what the engine owns is the
  * scoring pass, and a formula-defined table lets the DuckDB oracle
  * recompute scores exactly with no fixture file on the SQL side.
  *
  * Integer-exact by construction: weights are integers in [-1000, 1000]
  * ("milli" units), a document's `score_sum` is an exact BIGINT, and the
  * label compares `score_sum` against `threshold × n_words` by integer
  * cross-multiplication — no division, no doubles, no transcendentals, so
  * the hash gate can cover every row bit-for-bit.
  *
  * Scale shape: one codegen'd projection in the scan stage — per row a
  * native kernel ([[graft.functions.TextHashOps.wordHashes]]) plus an
  * integer fold. No shuffle, no UDF, no vocabulary table to join: the
  * "model" rides in the expression itself. At 100 TB this runs at read
  * throughput alongside the other quality gates (`d_pipeline_prep`).
  */
object Classifier {

  /** Feature-space size. 2^10 keeps the oracle's arithmetic tiny; a real
    * trained model would use 2^20+ — the operator shape is unchanged.
    */
  val numBuckets = 1024

  /** Default decision thresholds, in milli (mean-weight) units. */
  val keepMilli = 25L
  val discardMilli = -25L

  /** The committed weight of feature bucket `b` (integer in [-1000, 1000]):
    * `((b + 1) * 48271) mod 2001 - 1000` — one Lehmer step, the repo's
    * standard mixer, small enough to never overflow in either engine.
    */
  def weightOf(bucket: Column): Column =
    pmod((bucket + 1) * 48271L, lit(2001L)) - 1000L

  /** HOF reference score expressions over a text column: `(n_words,
    * score_sum)` where `score_sum` = Σ over word occurrences of
    * `weightOf(wordHash mod numBuckets)` (bag semantics — repeats count).
    * This is the executable specification the fused kernel is parity-
    * pinned against (OpsSpec); [[classify]] uses the kernel — the HOF
    * `aggregate`/`transform` pair is CodegenFallback (the round-1 lesson).
    */
  def scoreExprs(text: Column): (Column, Column) = {
    val hs = graft.functions.TextFunctions.word_hashes(text)
    val sum = aggregate(
      transform(hs, h => weightOf(pmod(h, lit(numBuckets.toLong)))),
      lit(0L), (acc, v) => acc + v)
    (size(hs).cast("int"), sum)
  }

  /** Classify a documents frame: adds `n_words` (INT), `score_sum`
    * (BIGINT) and `label` ('keep' | 'borderline' | 'discard' | 'empty').
    * Label cut: keep iff mean weight ≥ `keepMilli` ⇔ `score_sum ≥
    * keepMilli · n_words` (exact integer cross-multiplication; same for
    * discard). Zero words → 'empty' (no mean exists); NULL text → NULLs.
    */
  def classify(df: DataFrame, textCol: String = "text",
      keep: Long = keepMilli, discard: Long = discardMilli): DataFrame = {
    require(keep > discard, s"keep ($keep) must exceed discard ($discard)")
    val s0 = graft.functions.TextFunctions.classifier_score(col(textCol), numBuckets)
    withScoreAndLabel(df, textCol, s0, keep, discard)
  }

  /** TRAIN the weight table from a labeled seed frame — the standard
    * pipeline stage (CCNet/LLaMA: positive = a curated corpus, negative =
    * random crawl) as ONE map-side-combined aggregate: every word
    * occurrence hashes to its feature bucket, and per bucket the positive
    * and negative occurrence counts yield a smoothed, milli-scaled,
    * centered positive rate
    *
    *   `w_milli = ⌊(pos+1)·1000 / (pos+neg+2)⌋ − 500  ∈ [−500, 500]`
    *
    * (add-one smoothing, so unseen-side buckets shrink toward 0) — a
    * naive-Bayes-flavored discriminative weight in PURE INTEGER
    * arithmetic: no logs, no doubles, so the DuckDB oracle recomputes
    * every weight bit-for-bit, and the whole train → weights → gate chain
    * stays inside the hash-compared plan. Emits `(bucket, pos_cnt,
    * neg_cnt, w_milli)` for every OBSERVED bucket; absent buckets score 0
    * at inference ([[trainedWeights]] fills them).
    *
    * Scale shape: explode word hashes → one `groupBy(bucket)` whose
    * output is ≤ [[numBuckets]] rows with map-side partial aggregation —
    * word-count shape, no other shuffle. NULL labels raise (the
    * guard-before-use convention: a silently-skipped seed doc would bias
    * the prior); NULL text contributes no occurrences.
    */
  def train(labeled: DataFrame, textCol: String = "text",
      labelCol: String = "is_positive"): DataFrame = {
    val y = when(col(labelCol).isNull, raise_error(lit(
        s"Classifier.train: null $labelCol — label every seed document " +
          "or filter unlabeled rows upstream")))
      .otherwise(col(labelCol).cast("boolean"))
    val hs = graft.functions.TextFunctions.word_hashes(col(textCol))
    val counts = labeled.select(y.as("__y"), explode(hs).as("__h"))
      .groupBy(pmod(col("__h"), lit(numBuckets.toLong)).as("bucket"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("pos_cnt"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("neg_cnt"))
    // exact integer division: (a - a mod b) / b — both engines share the
    // spelling-independent value since a, b are non-negative integers
    val num = (col("pos_cnt") + 1L) * 1000L
    val den = col("pos_cnt") + col("neg_cnt") + 2L
    counts.withColumn("w_milli",
      (((num - pmod(num, den)) / den).cast("long") - 500L))
  }

  /** Pack [[train]]'s output into the bucket-indexed array
    * [[classifyTrained]] consumes — a ≤[[numBuckets]]-row driver collect
    * (the BPE merge-table precedent: vocabulary-sized model artifacts ride
    * into the plan as literals/references, never as a per-row join).
    * Unobserved buckets default to weight 0.
    */
  def trainedWeights(weightTable: DataFrame): Array[Long] =
    packWeights(weightTable, "w_milli")

  /** Bucket-indexed long-array pack of any (bucket, <valueCol>) table —
    * shared by the classifier ([[trainedWeights]]) and the DSIR estimator
    * ([[dsirLogRatios]]); absent buckets stay 0.
    */
  def packWeights(weightTable: DataFrame, valueCol: String): Array[Long] = {
    val arr = new Array[Long](numBuckets)
    weightTable.select(col("bucket").cast("long"), col(valueCol).cast("long"))
      .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** DSIR-style importance estimator (Data Selection via Importance
    * Resampling, Xie et al. 2023, arXiv:2302.03169): per hashed feature
    * bucket, the log-ratio of add-one-smoothed occurrence probabilities
    * between the TARGET distribution (occurrences in `targetCol` = true
    * documents — the curated corpus the training mix should resemble) and
    * the RAW distribution (occurrences in ALL documents — the crawl being
    * resampled), in integer MICRO-NATS:
    *
    *   `lr_micro = round(1e6 · (ln((t+1)/(T+B)) − ln((r+1)/(R+B))))`
    *
    * where t/r are the bucket's target/raw occurrence counts, T/R the
    * totals, B = [[numBuckets]]. Emits a DENSE `(bucket, t_cnt, r_cnt,
    * lr_micro)` table (all B rows) so unobserved buckets carry the
    * smoothed default rather than a silent 0. The micro-nat integerization
    * is the [[train]] milli-unit convention one scale up: the per-document
    * sum stays exact BIGINT arithmetic (the hash gate covers it), and the
    * only transcendental runs once per BUCKET — B evaluations total,
    * mirrored by the oracle's `ln` (the BM25 precedent) — never per word.
    *
    * Scale shape: identical to [[train]] — explode word hashes, ONE
    * map-side-combined `groupBy(bucket)` aggregate bounded at B rows, plus
    * a B-row totals pass. NULL target labels raise (guard-before-use).
    */
  def dsirLogRatios(labeled: DataFrame, textCol: String = "text",
      targetCol: String = "is_target"): DataFrame = {
    val y = when(col(targetCol).isNull, raise_error(lit(
        s"Classifier.dsirLogRatios: null $targetCol — label every document " +
          "or filter unlabeled rows upstream")))
      .otherwise(col(targetCol).cast("boolean"))
    val hs = graft.functions.TextFunctions.word_hashes(col(textCol))
    val counts = labeled.select(y.as("__y"), explode(hs).as("__h"))
      .groupBy(pmod(col("__h"), lit(numBuckets.toLong)).as("bucket"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("t_cnt"),
        count(lit(1)).as("r_cnt"))
    val dense = labeled.sparkSession.range(numBuckets)
      .select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
        coalesce(col("r_cnt"), lit(0L)).as("r_cnt"))
    val tot = dense.agg(sum("t_cnt").as("__T"), sum("r_cnt").as("__R"))
    val b = lit(numBuckets.toLong)
    dense.crossJoin(broadcast(tot))
      .select(col("bucket"), col("t_cnt"), col("r_cnt"),
        round((log((col("t_cnt") + 1L).cast("double") /
            (col("__T") + b).cast("double"))
          - log((col("r_cnt") + 1L).cast("double") /
            (col("__R") + b).cast("double"))) * lit(1000000.0), 0)
          .cast("long").as("lr_micro"))
  }

  /** DSIR selection: score every document's mean micro-nat log-ratio per
    * word — `importance = lr_sum / n_words`, the length-normalized log
    * importance weight — through the SAME codegen'd trained-weights kernel
    * as [[classifyTrained]] (the model rides in the expression; inference
    * is one scan-stage projection, no join), then keep the global top `n`
    * (greedy resampling-without-replacement under deterministic ranking —
    * ties to the smaller id). Zero-word and NULL-text documents carry no
    * importance and are excluded.
    *
    * Scale shape: scoring is read-throughput; the cut plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort — the
    * BM25 cut's pin), and the rank window runs on the n-row result only.
    */
  def dsirTopN(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Long], n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n must be positive: $n")
    val s0 = graft.functions.TextFunctions.classifier_score_trained(col(textCol), weights)
    val scored = docs.withColumn("__ds", s0)
      .select(col(idCol), col("__ds").getField("n_words").as("n_words"),
        col("__ds").getField("score_sum").as("lr_sum"))
      .where(col("n_words") > 0)
      .withColumn("importance",
        col("lr_sum").cast("double") / col("n_words").cast("double"))
    val top = scored.orderBy(col("importance").desc, col(idCol)).limit(n)
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("importance").desc, col(idCol))).cast("int"))
  }

  /** [[classify]] with a TRAINED weight table: same added columns, same
    * integer cross-multiplied label cut, but the per-bucket weight comes
    * from the model artifact — train → weights → gate, end-to-end inside
    * the plan. Inference is still one codegen'd scan-stage projection
    * (the weights ride in the expression via a codegen object reference,
    * no join, no UDF). Trained weights live in [−500, 500] milli, so the
    * default ±25 thresholds keep their meaning.
    */
  def classifyTrained(df: DataFrame, weights: Seq[Long],
      textCol: String = "text", keep: Long = keepMilli,
      discard: Long = discardMilli): DataFrame = {
    require(keep > discard, s"keep ($keep) must exceed discard ($discard)")
    require(weights.length == numBuckets,
      s"weight table must cover all $numBuckets buckets, got ${weights.length}")
    val s0 = graft.functions.TextFunctions.classifier_score_trained(col(textCol), weights)
    withScoreAndLabel(df, textCol, s0, keep, discard)
  }

  /** DSIR admission GATE — the streamable form of [[dsirTopN]]: keep/flag
    * every document whose mean micro-nat importance reaches
    * `minImportanceMicro`, decided by exact integer cross-multiplication
    * (`lr_sum ≥ minImportanceMicro · n_words` — no division, no doubles,
    * the [[classify]] label-cut convention), so the hash gate covers every
    * row and the identical row-local transform runs under `readStream`
    * (a global top-n needs the whole corpus; a threshold admits each
    * document the moment it arrives — the two standard DSIR serving
    * shapes). Adds `n_words`, `lr_sum`, `admitted`; NULL text → NULL
    * admitted, zero-word documents are never admitted (no importance
    * exists).
    */
  def dsirGate(docs: DataFrame, weights: Seq[Long],
      minImportanceMicro: Long, textCol: String = "text"): DataFrame = {
    val s0 = graft.functions.TextFunctions.classifier_score_trained(col(textCol), weights)
    docs.withColumn("__ds", s0)
      .withColumn("n_words", col("__ds").getField("n_words"))
      .withColumn("lr_sum", col("__ds").getField("score_sum"))
      .drop("__ds")
      .withColumn("admitted",
        when(col(textCol).isNull, lit(null).cast("boolean"))
          .otherwise(col("n_words") > 0 &&
            col("lr_sum") >= lit(minImportanceMicro) * col("n_words")))
  }

  /** Shared tail of [[classify]]/[[classifyTrained]]: unpack the score
    * struct and apply the integer cross-multiplied label cut. ONE
    * definition, so the seeded and trained gates cannot drift.
    */
  private def withScoreAndLabel(df: DataFrame, textCol: String,
      scoreStruct: Column, keep: Long, discard: Long): DataFrame =
    df.withColumn("__cls", scoreStruct)
      .withColumn("n_words", col("__cls.n_words"))
      .withColumn("score_sum", col("__cls.score_sum"))
      .drop("__cls")
      .withColumn("label",
        when(col(textCol).isNull, lit(null).cast("string"))
          .when(col("n_words") === 0, "empty")
          .when(col("score_sum") >= lit(keep) * col("n_words"), "keep")
          .when(col("score_sum") <= lit(discard) * col("n_words"), "discard")
          .otherwise("borderline"))
}
