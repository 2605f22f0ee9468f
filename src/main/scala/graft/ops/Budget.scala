package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global admission budgets over a totally-ordered corpus — "take documents
  * in id order until the token budget is spent", across ALL sources.
  *
  * The naive form is a single running-sum window with no PARTITION BY,
  * which Spark executes on ONE task — a serialization wall at 100 TB (the
  * reason `d_pipeline_prep` windows per source). This operator computes the
  * identical global prefix sum in two parallel stages instead:
  *
  *  1. rows bucket by `floor(id / bucketWidth)`; a map-side-combined
  *     aggregate produces one weight sum per bucket (tiny);
  *  2. bucket offsets = running sum over the bucket sums — a window over
  *     `#buckets` rows, the only sequential step, O(corpus / bucketWidth);
  *  3. offsets broadcast back, and each bucket computes its own
  *     within-bucket running sum in parallel; `cum = bucket offset +
  *     within-bucket prefix`.
  *
  * One full-data shuffle total (the per-bucket window), same as any
  * groupBy — versus the naive plan's shuffle-everything-to-one-task.
  * `bucketWidth` tunes bucket count ≈ corpus span / width; pick it so
  * buckets are a few million rows at target scale. Results are identical
  * to the naive window (the DuckDB oracle IS the naive global window).
  */
object Budget {

  /** Admit rows in `idCol` order while the running `weightCol` total stays
    * within `budget`; emits the running total as `cum`. Ids must be unique
    * and non-negative (dense helps bucket balance but isn't required).
    * Weights must be non-negative — a negative weight would make the
    * running total non-monotonic, so `where(cum <= budget)` would admit a
    * non-prefix set; the first negative weight fails the job (a cheap
    * codegen'd branch on the scan, not a separate validation pass).
    */
  def globalRunningBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w0 = col(weightCol).cast("long")
    val w = when(w0 < 0, raise_error(concat(
        lit(s"globalRunningBudget: negative $weightCol at $idCol="),
        col(idCol).cast("string")))).otherwise(w0)
    // integer `div`, not floor(double /): above 2^53 a double quotient
    // loses precision and bucket boundaries drift from the documented width
    val withB = df
      .withColumn("__idl", col(idCol).cast("long"))
      .withColumn("__b", expr(s"__idl div ${bucketWidth}L"))
      .drop("__idl")
      .withColumn("__w", w)
    val bucketSums = withB.groupBy("__b")
      .agg(sum(col("__w")).as("__bsum"))
    // the one sequential step: a running sum over #buckets rows
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("__off", coalesce(sum("__bsum").over(wOff), lit(0L)))
      .select("__b", "__off")
    val wIn = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), "__b")
      .withColumn("cum", col("__off") + sum(col("__w")).over(wIn))
      .where(col("cum") <= budget)
      .drop("__b", "__off", "__w")
  }
}
