package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot_product

/** Similarity search over an embedding column (`array<float>`), two tiers:
  *
  *  - brute-force cosine top-k — the exactness baseline. The corpus side is
  *    broadcast when small; at scale the query side fans out per partition,
  *    so the join is embarrassingly parallel (no shuffle of the corpus).
  *  - LSH-bucketed ANN — random-hyperplane signs bucket vectors; only
  *    same-bucket candidates are scored. Hyperplane coefficients are a
  *    deterministic constant-folded ±1 literal matrix (data-independent,
  *    reproducible, no stored model). The scale path: shuffle keys are
  *    small ints, candidate sets shrink ~2^planes-fold.
  *
  * The inner product is a custom codegen'd Catalyst expression
  * (graft.functions.DotProduct) — Spark's HOF fold is CodegenFallback and
  * interprets every lambda step; the native loop keeps the whole stage in
  * generated code. Summation is sequential, so results stay bit-identical
  * to the DuckDB oracle's `list_reduce` fold. Norms are computed once per
  * row, never per pair.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot_product(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private val MaxDims = 512

  /** Deterministic ±1 hyperplane matrix (plane p, dim i) as a constant-
    * folded literal; sign from a fixed LCG so runs are reproducible with no
    * stored model. Plane vectors are truncated to the data's dimension by
    * DotProduct's min-length loop.
    */
  private def signRow(p: Int): Column = array((0 until MaxDims).map { i =>
    val x = (p.toLong * 1000003L + i.toLong * 7919L + 12345L) * 2654435761L
    lit(if (((x >>> 16) & 1L) == 1L) 1.0 else -1.0)
  }: _*)

  /** Bucket id = packed sign bits of the `planes` projections. */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
      shiftleft(acc, 1).bitwiseOR(
        when(dot_product(v, signRow(p)) > 0, 1L).otherwise(0L))
    }

  private def prep(df: DataFrame, idName: String): DataFrame =
    df.select(col(idName),
      transform(col("vec"), _.cast("double")).as(s"${idName}_v"))
      .withColumn(s"${idName}_n", norm(col(s"${idName}_v")))

  /** Brute-force cosine top-k: every query vector against the whole corpus.
    * Exact; the oracle baseline. Corpus is broadcast (small side); per-side
    * norms are precomputed.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
  ): DataFrame = {
    val q = prep(queries, "qid")
    val c = prep(corpus, "cid")
    val scored = q.crossJoin(broadcast(c))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot_product(col("qid_v"), col("cid_v")) /
          (col("qid_n") * col("cid_n")), 6).as("sim"))
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
    val q = prep(queries, "qid").withColumn("bucket",
      hyperplaneBucket(col("qid_v"), planes))
    val c = prep(corpus, "cid").withColumn("bucket",
      hyperplaneBucket(col("cid_v"), planes))
    val scored = q.join(c, "bucket")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot_product(col("qid_v"), col("cid_v")) /
          (col("qid_n") * col("cid_n")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
