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
  def trainedWeights(weightTable: DataFrame): Array[Long] = {
    val arr = new Array[Long](numBuckets)
    weightTable.select(col("bucket").cast("long"), col("w_milli").cast("long"))
      .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
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
