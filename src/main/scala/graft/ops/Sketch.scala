package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching — KMV (k-minimum-values).
  *
  * A 100 TB pipeline constantly wants cheap per-group cardinalities
  * (distinct shingles per source, distinct URLs per snapshot) where exact
  * distinct is affordable but repeated, and HyperLogLog is the standard
  * answer. HLL's register layout is implementation-defined, though —
  * Spark's estimate and DuckDB's disagree, so an HLL row could never pass
  * the byte-exact oracle gate. KMV (Bar-Yossef et al. 2002) has the same
  * one-pass, bounded-memory shape but is a PURE FUNCTION of the hashed
  * set: keep the k smallest distinct hash values; with `h_(k)` the k-th
  * smallest on the `[0, P57)` line, the estimate `(k−1)·P57 div h_(k)`
  * is integer arithmetic both engines reproduce bit-for-bit. Groups with
  * fewer than k distinct values are EXACT by the same rule (the sketch
  * isn't full, so it IS the set).
  *
  * k is capped at 64 so the numerator `(k−1)·P57` stays inside int64
  * (63 · (2⁵⁷−13) ≈ 9.08e18 < 2⁶³−1) — no decimal widening on either
  * side. Expected relative error ≈ 1/√(k−2) ≈ 13% at k = 64; the
  * operator reports estimate, exact, and realized error side by side,
  * which is the honest way to ship a sketch.
  *
  * Scale shape: one distinct on (group, hash), then the k-th minimum per
  * group is found WITHOUT a per-group corpus sort — a bucketed two-phase
  * cut (the exact-n sampler's trick): per-group histogram over fixed hash
  * ranges (map-side combined, ≤ groups×buckets rows), cumulative counts
  * pick each group's cutoff bucket, and only hashes at or below it
  * (≈ k + one bucket's worth per group) enter the per-group rank window.
  * The exact count rides the same distinct through a map-side-combined
  * aggregate.
  */
object Sketch {

  val P57: Long = graft.functions.TextHashOps.P57

  /** Maximum k such that `(k−1)·P57` fits int64. */
  val MaxK: Int = 64

  /** The Lehmer-mixed position of a raw hash — two rounds of
    * `·48271 mod P57` in exact DECIMAL(38,0) (the product exceeds
    * int64). ONE definition shared by the one-shot estimator, the
    * per-shard sketch builder, the merger, and the streaming running
    * sketch, so persisted sketches and live estimates can't drift.
    */
  def mixedPosition(h: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    (((h.cast(d38) + lit(1)) * lit(48271) % lit(P57)).cast(d38)
      * lit(48271) % lit(P57)).cast("long")
  }

  private def mixedExpr: Column = mixedPosition(col("__kv_h"))

  /** Per-(group × shard) KMV sketch rows: the ≤ k smallest mixed
    * positions of each shard's distinct hash set, one `(group, shard,
    * positions)` row — the PERSISTABLE form. KMV's 100 TB property is
    * mergeability: the union of per-shard k-minima is a superset of the
    * global k-minima, so [[kmvMergeEstimate]] over these rows returns
    * the EXACT same estimate as [[kmvDistinct]] over the raw corpus
    * (not approximately — set-identically; the shared oracle row proves
    * it). Build sketches once per shard/day, merge at query time.
    */
  def kmvSketch(df: DataFrame, groupCol: String, shardCol: String,
      hashCol: Column, k: Int = MaxK): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k out of [2, $MaxK]: $k")
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.kmvSketch: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    df.select(col(groupCol).as("__kv_g"), col(shardCol).as("__kv_s"),
        h.as("__kv_h"))
      .select(col("__kv_g"), col("__kv_s"), mixedExpr.as("__kv_m")).distinct()
      .groupBy("__kv_g", "__kv_s")
      // slice(sort(collect_set)) is shard-sized input but k-sized output;
      // shards are the unit a builder controls, so the set stays bounded
      .agg(slice(array_sort(collect_set(col("__kv_m"))), 1, k).as("positions"))
      .select(col("__kv_g").as(groupCol), col("__kv_s").as(shardCol),
        col("positions"))
  }

  /** Merge per-shard sketches and estimate: union the position lists per
    * group, keep the k smallest distinct, apply the same
    * `(k−1)·P57 div m_(k)` rule (exact count when the merged sketch
    * holds fewer than k positions). Output `(group, n_est)` — exactly
    * [[kmvDistinct]]'s estimate column, by the superset property.
    */
  def kmvMergeEstimate(sketches: DataFrame, groupCol: String,
      k: Int = MaxK): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k out of [2, $MaxK]: $k")
    sketches
      .select(col(groupCol).as("__kv_g"), explode(col("positions")).as("__kv_m"))
      .distinct()
      .groupBy("__kv_g")
      .agg(slice(array_sort(collect_set(col("__kv_m"))), 1, k).as("__kv_ps"))
      .select(col("__kv_g").as(groupCol),
        when(size(col("__kv_ps")) < k,
          size(col("__kv_ps")).cast("long"))
          .otherwise(expr(
            s"CAST((${(k - 1).toLong} * ${P57}L) DIV element_at(__kv_ps, $k) AS BIGINT)"))
          .as("n_est"))
  }

  /** Per-`groupCol` KMV estimate of `countDistinct(hashCol)`, with the
    * exact count and realized relative error. `hashCol` values must lie
    * on the `[0, P57)` line (the shingle/word/passage kernels all do);
    * NULL hashes raise — a null has no position on the hash line.
    * Output: `(group, n_exact, n_est, rel_err)`.
    *
    * KMV needs UNIFORM positions, and the poly-57 kernels are not: a
    * short shingle's polynomial never wraps the modulus, so short-string
    * hashes pile up at the bottom of the line and the raw-k-th-minimum
    * estimate overshoots several-fold (measured 1.2–2.9 relative error
    * on the word-salad corpus). The sketch therefore ranks a MIXED
    * position: two Lehmer rounds `((h+1)·48271 mod P57)·48271 mod P57`
    * — the sampler family's generator lifted to the P57 line, computed
    * in exact DECIMAL(38,0) (the product exceeds int64; DuckDB replays
    * it in HUGEINT). The mixing is a BIJECTION (invertible maps mod the
    * prime), so distinct positions == distinct hashes and one distinct
    * pass serves both the exact count and the sketch.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, hashCol: Column,
      k: Int = MaxK, buckets: Int = 4096): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k out of [2, $MaxK]: $k")
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.kmvDistinct: null hash — a null has no position on the " +
          "hash line; filter upstream")))
      .otherwise(hashCol.cast("long"))
    val bw = P57 / buckets + 1
    // ONE corpus-wide distinct, on the MIXED position: the mixing is a
    // BIJECTION on [0, P57) (multiplications by 48271 mod the prime P57
    // and the +1 rotation are all invertible), so distinct positions ==
    // distinct hashes — n_exact is exact, the position set is exactly
    // what the persisted per-shard sketches carry, and no second
    // distinct pass is needed
    val dm = df.select(col(groupCol).as("__kv_g"), h.as("__kv_h"))
      .select(col("__kv_g"), mixedExpr.as("__kv_m")).distinct()
    val exact = dm.groupBy("__kv_g").agg(count(lit(1)).as("n_exact"))
    // integer bucket id (DIV, not double /): positions exceed 2^53, so
    // double division would round; DIV keeps the bucket function exact
    val hist = dm.groupBy(col("__kv_g"), expr(s"__kv_m DIV ${bw}L").as("__kv_b"))
      .agg(count(lit(1)).as("__kv_c"))
    val wCum = Window.partitionBy("__kv_g").orderBy("__kv_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-group cutoff bucket: first bucket whose cumulative count
    // reaches k (NULL = group has < k distinct → sketch not full → exact)
    val cuts = hist.withColumn("__kv_cum", sum("__kv_c").over(wCum))
      .groupBy("__kv_g")
      .agg(min(when(col("__kv_cum") >= k, col("__kv_b"))).as("__kv_bcut"))
    val survivors = dm.join(broadcast(cuts), Seq("__kv_g"))
      .where(col("__kv_bcut").isNotNull &&
        expr(s"__kv_m DIV ${bw}L") <= col("__kv_bcut"))
    val wRank = Window.partitionBy("__kv_g").orderBy("__kv_m")
    val hk = survivors.withColumn("__kv_rk", row_number().over(wRank))
      .where(col("__kv_rk") === k)
      .select(col("__kv_g"), col("__kv_m").as("__kv_hk"))
    exact.join(hk, Seq("__kv_g"), "left")
      .withColumn("n_est",
        when(col("__kv_hk").isNull, col("n_exact"))
          .otherwise(expr(s"CAST((${(k - 1).toLong} * ${P57}L) DIV __kv_hk AS BIGINT)")))
      .withColumn("rel_err",
        round(abs(col("n_est") - col("n_exact")).cast("double")
          / col("n_exact").cast("double"), 6))
      .select(col("__kv_g").as(groupCol), col("n_exact"), col("n_est"),
        col("rel_err"))
  }
}
