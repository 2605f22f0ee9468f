package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), two tiers:
  *
  *  - brute-force cosine top-k — the exactness baseline. The corpus side is
  *    broadcast when small; at scale the query side fans out per partition,
  *    so the join is embarrassingly parallel (no shuffle of the corpus).
  *  - LSH-bucketed ANN — random-hyperplane signs bucket vectors; only
  *    same-bucket candidates are scored. Hyperplane coefficients derive
  *    from deterministic hashes (data-independent, reproducible, no stored
  *    model). The scale path: shuffle keys are small ints, candidate sets
  *    shrink ~2^planes-fold.
  *
  * Dot/norm are double-precision sequential folds (higher-order functions,
  * codegen'd) — bit-reproducible against the DuckDB oracle.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane sign for dimension i of plane p:
    * sign(xxhash64(p || i)). Bucket = packed sign bits of the projections.
    */
  def hyperplaneBucket(v: Column, planes: Int): Column = {
    val projections = transform(sequence(lit(0), lit(planes - 1)), p =>
      aggregate(
        zip_with(v,
          transform(sequence(lit(0), size(v) - 1),
            i => when(xxhash64(p * 10007 + i) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x))
    aggregate(projections, lit(0L),
      (acc, proj) => acc * 2 + when(proj > 0, 1L).otherwise(0L))
  }

  /** Brute-force cosine top-k: every query vector against the whole corpus.
    * Exact; use as the oracle baseline and for small/broadcastable corpora.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
  ): DataFrame = {
    val q = queries.select(col("qid"),
      transform(col("vec"), _.cast("double")).as("qv"))
    val c = corpus.select(col("cid"),
      transform(col("vec"), _.cast("double")).as("cv"))
    val scored = q.crossJoin(broadcast(c))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** ANN top-k via hyperplane LSH: score only same-bucket candidates. With
    * multi-probe = 0 this trades recall for a ~2^planes candidate cut.
    */
  def lshTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      planes: Int = 8,
  ): DataFrame = {
    val q = queries.select(col("qid"),
      transform(col("vec"), _.cast("double")).as("qv"))
      .withColumn("bucket", hyperplaneBucket(col("qv"), planes))
    val c = corpus.select(col("cid"),
      transform(col("vec"), _.cast("double")).as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes))
    val scored = q.join(c, "bucket")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
