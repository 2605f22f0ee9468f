package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination for training corpora: find corpus documents
  * that share verbatim n-gram content with an evaluation/benchmark set, so
  * they can be dropped before training (the standard guard against eval
  * leakage).
  *
  * Overlap unit = the same distinct 3-word shingle hashes the dedup
  * operators use ([[graft.functions.TextHashOps]] native kernels), so one
  * scan-side signature serves dedup and decontamination alike.
  *
  * Scale shape: benchmark sets are tiny relative to a 100 TB corpus, so
  * the exploded benchmark shingle table is BROADCAST — corpus shingles
  * stream through a map-side hash join with no corpus-wide shuffle; only
  * the matching (doc, shingle, bench) triples (rare by construction)
  * reach the per-document aggregate. The corpus is never self-joined and
  * never collected.
  */
object Decontaminate {

  /** Per-corpus-document overlap against the benchmark set: `n_shared` =
    * distinct shingle hashes the document shares with ANY benchmark doc,
    * `n_bench` = distinct benchmark docs it collides with. Documents with
    * `n_shared >= minShared` are returned (these are the ones a pipeline
    * would quarantine). Both frames need (`idCol`, `textCol`).
    */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
      out: String) = df.select(
    col(idCol).as(out),
    explode(TextFunctions.shingle_hashes(col(textCol))).as("sh"))

  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    shingled(corpus, idCol, textCol, "cid")
      .join(broadcast(shingled(bench, idCol, textCol, "bid")), "sh")
      .groupBy("cid")
      .agg(countDistinct("sh").as("n_shared"), countDistinct("bid").as("n_bench"))
      .where(col("n_shared") >= minShared)
      .select(col("cid").as(idCol), col("n_shared"), col("n_bench"))
  }

  /** Per-(corpus doc, benchmark doc) ATTRIBUTION of [[overlap]]: which
    * eval item leaked into which document, with the distinct-shingle
    * evidence count — the audit table a decontamination report cites
    * ([[overlap]] aggregates it away to one row per corpus doc). Same
    * scale shape: broadcast bench shingles, corpus streamed once; output
    * is bounded by actual contamination, not the cross product.
    */
  def overlapPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    shingled(corpus, idCol, textCol, "cid")
      .join(broadcast(shingled(bench, idCol, textCol, "bid")), "sh")
      .groupBy("cid", "bid")
      .agg(countDistinct("sh").as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("cid").as(idCol), col("bid").as("bench_id"), col("n_shared"))
  }

  /** Containment-RATIO variant of [[overlap]]: flags a corpus document when
    * the FRACTION of its distinct shingles found anywhere in the benchmark
    * set reaches `minRatio` — the right gate for short eval items, where a
    * fixed absolute shingle count either misses short questions (threshold
    * too high) or quarantines long documents for incidental phrase overlap
    * (too low). Same scale shape as [[overlap]]: the distinct benchmark
    * shingle set is broadcast, the corpus streams map-side, and only
    * matching shingles reach the per-document aggregate (per-document
    * shingle totals ride the scan rows — no second corpus pass).
    */
  def containment(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minRatio: Double = 0.5): DataFrame = {
    require(minRatio > 0 && minRatio <= 1, s"minRatio out of (0,1]: $minRatio")
    val corpusSh = corpus.select(
        col(idCol).as("cid"),
        TextFunctions.shingle_hashes(col(textCol)).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("cid"), size(col("shs")).as("n_shingles"),
        explode(col("shs")).as("sh"))
    val benchSh = bench
      .select(explode(TextFunctions.shingle_hashes(col(textCol))).as("sh"))
      .distinct()
    corpusSh.join(broadcast(benchSh), "sh")
      .groupBy("cid", "n_shingles")
      .agg(count(lit(1)).as("n_shared")) // distinct by construction: shs is a set
      .withColumn("containment",
        round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6))
      .where(col("containment") >= minRatio)
      .select(col("cid").as(idCol), col("n_shared"),
        col("n_shingles").cast("int").as("n_shingles"), col("containment"))
  }
}
