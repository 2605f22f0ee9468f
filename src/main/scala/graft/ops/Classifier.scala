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
    df.withColumn("__cls", s0)
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
}
