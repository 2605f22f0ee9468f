package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Materialize.MaterializeOps

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
  *     window) picks the k-th-best score, k = ceil(frac · n). k is
  *     computed in DECIMAL, not IEEE double: `0.1 * 200` in double is
  *     20.000000000000004 and `ceil` of it 21, one past the mathematical
  *     ceiling — the decimal product is exact, and the DuckDB oracle's
  *     native-decimal `CEIL(0.25 * n)` mirrors it;
  *  3. the 1-row cutoff broadcasts back and the corpus filters on it.
  *
  * The quantized-score precondition is ENFORCED, not assumed: the cutoff
  * frame counts the histogram as it aggregates it and raise_errors past
  * `maxDistinct` — called on a raw continuous score the job fails with a
  * pointer at [[selectTopFractionApprox]] instead of silently turning the
  * "histogram" corpus-sized and the single-partition window into the
  * serialization wall Budget exists to avoid.
  *
  * Ties AT the cutoff are all kept (the filter is `score >= cutoff`), so
  * the selected fraction can exceed `frac` by the tie mass — determinism
  * over exact-n, the right trade for reproducible corpus selection. Two
  * corpus passes (histogram + filter) are inherent to an exact global
  * cutoff; both are scans, neither shuffles the corpus.
  */
object Quantile {

  /** Default ceiling on histogram cardinality: an order above the 4-decimal
    * quantization contract (10001 distinct), far below corpus-sized.
    */
  val DefaultMaxDistinct = 100000L

  /** 1-row frame `(__cut)`: the k-th best `scoreCol` value, k = ceil(frac·n)
    * in exact decimal arithmetic. Fails the job if the score column has
    * more than `maxDistinct` distinct values, or any NULL — both
    * precondition guards fire BEFORE the serialization wall they exist to
    * prevent: the null check is a scan-stage branch, and the cardinality
    * check lives on the BROADCAST side of the cutoff join, which Spark
    * materializes before the single-partition window stage may run — a
    * corpus-sized histogram kills the job in the (parallel) count
    * aggregate with a pointed message, never inside the one-task sort.
    * (Nulls can't just be ignored: they'd inflate n — shrinking the
    * selected fraction — and a null majority would make the cutoff
    * itself null, silently selecting nothing.)
    */
  def topFractionCutoff(df: DataFrame, scoreCol: String, frac: Double,
      maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    require(maxDistinct > 0, s"maxDistinct must be positive: $maxDistinct")
    val v = when(col(scoreCol).isNull,
        raise_error(lit(s"topFractionCutoff: null $scoreCol — the exact " +
          "histogram gate requires non-null quantized scores")))
      .otherwise(col(scoreCol))
    val hist = df.groupBy(v.as("__v")).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // guard on the broadcast side: evaluated when the 1-row total frame
    // materializes, i.e. before the window's single-task stage executes
    val tot = hist.agg(sum("__c").as("__n"), count(lit(1)).as("__nd"))
      .select(col("__n"),
        when(col("__nd") > maxDistinct, raise_error(concat(
          lit(s"topFractionCutoff: $scoreCol has "), col("__nd").cast("string"),
          lit(s" distinct values (> $maxDistinct); the exact histogram gate " +
            "requires quantized scores — use selectTopFractionApprox for " +
            "continuous scores")))
        ).otherwise(col("__nd")).as("__nd"))
    // BigDecimal.valueOf(frac) is the shortest decimal that parses back to
    // the same double — the same text a caller wrote, made exact
    val k = ceil(lit(BigDecimal.valueOf(frac)) * col("__n"))
    // materialize the 1-row cutoff: its derivation embeds the whole
    // input subtree, and the gate's filter join would otherwise carry a
    // second copy of the upstream plan (the Budget.runningTotals
    // exponential-composition lesson, r20)
    hist.withColumn("__cum", sum("__c").over(wCum))
      .crossJoin(broadcast(tot))
      .where(col("__cum") >= k && col("__nd") > 0)
      .agg(max("__v").as("__cut"))
      .materialized
  }

  /** Per-group EXACT quantiles over a QUANTIZED value — the length/score
    * profile card (p50/p90/p99 tokens per source) every corpus report
    * carries. Quantile `q` = the smallest value whose inclusive
    * ascending cumulative count reaches `ceil(q·n)` within the group
    * (the discrete lower-quantile rule; `ceil` on the exact decimal of
    * `q`, so there is no float boundary). Null values raise — exclude or
    * coalesce upstream, a silent skip would shrink n.
    *
    * Scale shape: one (group × value) histogram aggregate (map-side
    * combined — the value is quantized, so histograms are
    * cardinality-bounded), a per-group cumulative window OVER THE
    * HISTOGRAM (parallel across groups, each partition ≤ maxDistinct
    * rows), and one final per-group aggregate folding every requested
    * quantile at once. The corpus is never sorted.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)],
      maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach { case (n, q) =>
      require(q > 0 && q <= 1, s"quantile $n out of (0,1]: $q") }
    val v = when(col(valueCol).isNull,
        raise_error(lit(s"groupQuantiles: null $valueCol — exclude or " +
          "coalesce upstream; a silent skip would shrink n")))
      .otherwise(col(valueCol))
    // histogram-sized (cardinality-bounded) and consumed twice (totals
    // branch + the cumulative window) — materialize so the corpus scan
    // underneath runs once (the topFractionCutoff rule)
    val hist = df.groupBy(col(groupCol).as("__gq_g"), v.as("__gq_v"))
      .agg(count(lit(1)).as("__gq_c"))
      .materialized
    val wCum = Window.partitionBy("__gq_g").orderBy("__gq_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.groupBy("__gq_g")
      .agg(sum("__gq_c").as("__gq_n"), count(lit(1)).as("__gq_nd"))
      .select(col("__gq_g"), col("__gq_n"),
        when(col("__gq_nd") > maxDistinct, raise_error(concat(
          lit(s"groupQuantiles: $valueCol has "), col("__gq_nd").cast("string"),
          lit(s" distinct values in one group (> $maxDistinct); quantize " +
            "the value first"))))
          .otherwise(col("__gq_nd")).as("__gq_nd"))
    val aggs = qs.map { case (name, q) =>
      min(when(col("__gq_cum") >=
        ceil(lit(BigDecimal.valueOf(q)) * col("__gq_n")), col("__gq_v")))
        .as(name)
    }
    hist.withColumn("__gq_cum", sum("__gq_c").over(wCum))
      .join(broadcast(tot.where(col("__gq_nd") > 0)), Seq("__gq_g"))
      .groupBy(col("__gq_g"))
      .agg(first(col("__gq_n")).as("n_rows"), aggs: _*)
      .select(col("__gq_g").as(groupCol) +: col("n_rows") +:
        qs.map { case (name, _) => col(name) }: _*)
  }

  /** Curriculum phase assignment over a QUANTIZED score: rows are split
    * into `phases` equal-count quantile buckets of `scoreCol`, phase 1 =
    * lowest scores — the easy→hard ordering curriculum schedules train
    * on. Integer-exact and tie-stable: with `c(v)` = the inclusive
    * ascending cumulative count of score value `v` and `n` the corpus
    * size, `phase(v) = ceil(c(v)·phases / n)` computed as
    * `(c·P + n − 1) div n` — every row of the same score lands in the
    * same phase, and the boundary arithmetic has no floats for an oracle
    * to round differently. Same preconditions and guards as
    * [[topFractionCutoff]] (non-null, ≤ `maxDistinct` distinct values;
    * both fail loudly before the histogram window runs).
    *
    * Scale shape: one histogram aggregate (map-side combined), a
    * histogram-sized cumulative window (aggregate-fed single partition —
    * the same pinned shape as the top-fraction gate), and a BROADCAST
    * score→phase map joined back on the scan — the corpus is never
    * sorted or windowed.
    */
  def curriculumPhases(df: DataFrame, scoreCol: String, phases: Int,
      maxDistinct: Long = DefaultMaxDistinct): DataFrame = {
    require(phases >= 1 && phases <= 100000, s"phases out of range: $phases")
    require(maxDistinct > 0, s"maxDistinct must be positive: $maxDistinct")
    val v = when(col(scoreCol).isNull,
        raise_error(lit(s"curriculumPhases: null $scoreCol — the exact " +
          "histogram gate requires non-null quantized scores")))
      .otherwise(col(scoreCol))
    val hist = df.groupBy(v.as("__v")).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum("__c").as("__n"), count(lit(1)).as("__nd"))
      .select(col("__n"),
        when(col("__nd") > maxDistinct, raise_error(concat(
          lit(s"curriculumPhases: $scoreCol has "), col("__nd").cast("string"),
          lit(s" distinct values (> $maxDistinct); quantize the score first")))
        ).otherwise(col("__nd")).as("__nd"))
    // materialized like topFractionCutoff's frame and for the same
    // reason: the ≤ maxDistinct-row phase map embeds the input subtree
    val mapped = hist.withColumn("__cum", sum("__c").over(wCum))
      .crossJoin(broadcast(tot))
      .where(col("__nd") > 0)
      .select(col("__v"),
        expr(s"CAST((__cum * $phases + __n - 1) DIV __n AS INT)").as("phase"))
      .materialized
    df.join(broadcast(mapped), col(scoreCol) === col("__v")).drop("__v")
  }

  /** Keep rows whose `scoreCol` reaches the top-`frac` cutoff. */
  def selectTopFraction(df: DataFrame, scoreCol: String, frac: Double,
      maxDistinct: Long = DefaultMaxDistinct): DataFrame =
    df.join(broadcast(topFractionCutoff(df, scoreCol, frac, maxDistinct)),
        col(scoreCol) >= col("__cut"))
      .drop("__cut")

  /** Approximate top-`frac` gate for CONTINUOUS scores — the fallback the
    * exact gate's guard points at. Cutoff = `approx_percentile(score,
    * 1 − frac, accuracy)` (Greenwald–Khanna sketch: one map-side-combined
    * aggregate, no histogram shuffle, no cardinality bound), filter is the
    * same ties-kept `score >= cutoff`. The sketch's documented bound is on
    * RANK, not value: the cutoff sits within `n / accuracy` rows of the
    * true quantile, so the selected fraction is `frac ± 1/accuracy` (plus
    * tie mass) — membership of rows near the boundary can differ from the
    * exact gate, which is why the exact histogram form stays the gated
    * default for quantized scores.
    *
    * NULL scores raise, same as the exact gate and for the same reason:
    * `approx_percentile` would silently drop them from the sketch while
    * they also vanish from `score >= cutoff`, so a null-heavy corpus would
    * quietly gate a much smaller population than the caller asked about.
    * Filter nulls explicitly first if exclusion is the intent.
    */
  def selectTopFractionApprox(df: DataFrame, scoreCol: String, frac: Double,
      accuracy: Int = 10000): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val v = when(col(scoreCol).isNull,
        raise_error(lit(s"selectTopFractionApprox: null $scoreCol — gate " +
          "semantics require non-null scores; filter nulls explicitly first")))
      .otherwise(col(scoreCol))
    // frac = 1 must keep everything: percentile 0 of the sketch is the min
    // (1-row frame materialized — the topFractionCutoff rule)
    val cut = df.agg(approx_percentile(v, lit(1.0 - frac), lit(accuracy)).as("__cut"))
      .materialized
    df.join(broadcast(cut), v >= col("__cut")).drop("__cut")
  }
}
