package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact corpus-wide quantile gates over QUANTIZED scores — "keep the top
  * 25% of documents by quality score". `approx_percentile` would be the
  * generic answer, but pipeline scores are quantized by construction
  * (TextAnalysis.quality is `round(…, 4)` — ≤ 10001 distinct values), and
  * that bound makes the EXACT quantile cheap and reproducible:
  *
  *  1. value histogram: `groupBy(score).count` — map-side combine
  *     collapses each partition to ≤ #distinct rows, so the shuffle
  *     carries the histogram, not the corpus;
  *  2. cutoff: a running count over the score-sorted histogram (tiny,
  *     single partition by design — same shape as Budget's offsets
  *     window) picks the k-th-best score, k = ceil(frac · n);
  *  3. the 1-row cutoff broadcasts back and the corpus filters on it.
  *
  * Ties AT the cutoff are all kept (the filter is `score >= cutoff`), so
  * the selected fraction can exceed `frac` by the tie mass — determinism
  * over exact-n, the right trade for reproducible corpus selection. Two
  * corpus passes (histogram + filter) are inherent to an exact global
  * cutoff; both are scans, neither shuffles the corpus.
  */
object Quantile {

  /** 1-row frame `(__cut)`: the k-th best `scoreCol` value, k = ceil(frac·n). */
  def topFractionCutoff(df: DataFrame, scoreCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    val hist = df.groupBy(col(scoreCol).as("__v")).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("__cum", sum("__c").over(wCum))
      .crossJoin(broadcast(hist.agg(sum("__c").as("__n"))))
      .where(col("__cum") >= ceil(lit(frac) * col("__n")))
      .agg(max("__v").as("__cut"))
  }

  /** Keep rows whose `scoreCol` reaches the top-`frac` cutoff. */
  def selectTopFraction(df: DataFrame, scoreCol: String, frac: Double): DataFrame =
    df.join(broadcast(topFractionCutoff(df, scoreCol, frac)),
        col(scoreCol) >= col("__cut"))
      .drop("__cut")
}
