package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. Real
  * pipelines can't use `df.sample()` for data selection: its output
  * depends on partitioning and retries, so a re-run (or a backfill of one
  * partition) picks a different subset. Everything here derives from a
  * pure integer hash of the row id — the same row is always in or out, on
  * any cluster layout, and the DuckDB oracle recomputes membership exactly.
  *
  * Scale shape: [[hashSample]] is a stateless filter (fully pushed into
  * the scan stage, no shuffle); [[stratifiedFixed]] shuffles once on the
  * stratum key and top-n's within each stratum in parallel — the same
  * per-stratum-window pattern as the pipeline token budget (a global
  * sample order would serialize).
  */
object Sampling {

  private val P31 = 2147483647L // Mersenne prime 2^31 - 1

  /** Deterministic unit hash of a row id into [0, 2^31-1): two Lehmer
    * steps, `u = (((id mod p + 1) * 48271 mod p) * 48271) mod p`. One step
    * is NOT enough — small dense ids map to `(id+1)*48271`, which stays far
    * below p and would admit everything under any fractional threshold;
    * the second multiply wraps the range and mixes. Integer-only, so the
    * oracle mirrors it bit-for-bit.
    */
  def unitHash(id: Column): Column = {
    val s1 = pmod((pmod(id.cast("long"), lit(P31)) + 1) * 48271, lit(P31))
    pmod(s1 * 48271, lit(P31))
  }

  /** Keep rows whose unit hash falls below `fraction` of the hash range —
    * a deterministic Bernoulli sample. Emits the hash as `u` so downstream
    * stages (and the oracle) can audit membership.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    val cut = (fraction * P31).toLong
    df.withColumn("u", unitHash(col(idCol))).where(col("u") < cut)
  }

  /** Exactly-n-per-stratum deterministic sample: rows ranked inside each
    * stratum by (unit hash, id) — a uniform shuffle order that is stable
    * across runs — and the first `n` kept, with the rank emitted as `rk`.
    * One shuffle on the stratum key; strata are processed in parallel.
    * Oversampling guard: a stratum with fewer than `n` rows keeps all.
    */
  def stratifiedFixed(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val w = Window.partitionBy(col(strataCol)).orderBy(unitHash(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** Weighted corpus MIXTURE: scale every source to target proportions
    * (Pile-style "web : books : code = 3 : 1 : 0.5") under what's actually
    * available. The largest feasible total is `T = min_i avail_i / w_i`;
    * each source keeps its first `floor(T · w_i)` documents in the
    * deterministic hash order — so the output mixture matches the target
    * ratios exactly (up to flooring), is limited by the scarcest source,
    * and is reproducible on any layout. Sources with weight 0 (or not in
    * `weights`, with `default = 0`) are excluded.
    *
    * Scale shape: per-source counts and the feasibility min are tiny
    * aggregates; quotas broadcast back; the only corpus-sized work is the
    * per-stratum rank window — one shuffle on the stratum key, strata in
    * parallel (the [[stratifiedFixed]] pattern with a computed n).
    */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], default: Double = 0.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && default >= 0,
      "mixture weights must be non-negative")
    require((weights.values.toSeq :+ default).exists(_ > 0),
      "at least one mixture weight must be positive")
    val wt = weights.foldLeft(lit(default)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(w)).otherwise(acc) }
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__avail"))
      .withColumn("__wt", wt)
      .where(col("__wt") > 0)
    val tmax = counts.agg(min(col("__avail").cast("double") / col("__wt")).as("__t"))
    val quotas = counts.crossJoin(broadcast(tmax))
      .select(col(strataCol), floor(col("__t") * col("__wt")).cast("long").as("__quota"))
    val wRank = Window.partitionBy(col(strataCol)).orderBy(unitHash(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(wRank))
      .join(broadcast(quotas), Seq(strataCol))
      .where(col("rk") <= col("__quota"))
      .drop("__quota")
  }

  /** Deterministic epoch shuffle + shard: the "reshuffle the corpus each
    * training epoch" step. Every row gets a shard in `[0, nShards)` and a
    * stable position inside its shard, both pure integer functions of
    * `(id, epoch)` — so the ordering is identical on any cluster layout,
    * after any retry, and reproducible from the epoch number alone; a new
    * epoch permutes everything. Scale shape: ONE shuffle on the shard key
    * and per-shard windows running in parallel (the same
    * per-stratum-window pattern as [[stratifiedFixed]]); a naive global
    * `ORDER BY rand()` would both serialize and be unreproducible. At
    * write time the shards map 1:1 to output files
    * (`partitionBy("shard")`), which is what a data loader consumes.
    */
  def epochShards(df: DataFrame, idCol: String, nShards: Int, epoch: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    // salt the id with a large odd multiplier per epoch BEFORE hashing, so
    // epochs are unrelated permutations; kept in integer arithmetic the
    // oracle mirrors exactly
    val u = unitHash(col(idCol).cast("long") + lit(epoch.toLong * 2654435761L))
    val w = Window.partitionBy(col("shard")).orderBy(col("u"), col(idCol))
    df.withColumn("u", u)
      .withColumn("shard", pmod(col("u"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("u")
  }

  /** Per-stratum fractional sample: like [[hashSample]] but the threshold
    * varies by stratum (e.g. downsample web crawl to 10%, keep curated
    * sources whole). Strata missing from `fractions` use `default`.
    * Still a stateless filter — the when-cascade compiles into the scan.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double): DataFrame = {
    (fractions.values.toSeq :+ default).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f"))
    val cut = fractions.foldLeft(lit((default * P31).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * P31).toLong)).otherwise(acc)
    }
    df.withColumn("u", unitHash(col(idCol))).where(col("u") < cut)
  }
}
