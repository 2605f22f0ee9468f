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
  * the scan stage, no shuffle); [[stratifiedFixed]] / [[mixtureSample]]
  * pick "the n smallest hashes per stratum" in two phases — a bucketed
  * hash histogram chooses an exact per-stratum cutoff bucket, and only
  * the ~n rows below it ever reach a rank window. A naive
  * `row_number over (partition by stratum)` would bound parallelism by
  * the NUMBER of strata, which for a source-mixture job is single
  * digits with one source at ~90% of rows — that source would serialize
  * through one task (the same wall Budget's bucketed prefix sum exists
  * to avoid).
  */
object Sampling {

  private val P31 = 2147483647L // Mersenne prime 2^31 - 1

  /** Buckets for the two-phase exact-n selection: the hash range splits
    * into `SelectionBuckets` equal slices, so phase 1's histogram carries
    * ≤ strata × buckets rows and phase 2's rank window sees ≈ n +
    * avail/buckets rows per stratum.
    */
  val SelectionBuckets = 4096

  /** Rows bucketed by hash slice, plus the per-(stratum, bucket) histogram
    * and the exact per-stratum cutoff bucket `__bmax`: the smallest bucket
    * prefix guaranteed to hold at least `quota` rows (all buckets whose
    * PRECEDING cumulative count is < quota). Rows in buckets ≤ `__bmax`
    * are a superset of the quota smallest hashes — membership of the final
    * sample is exact by construction, no slack factor, no undershoot.
    * `quotaOf` maps the per-stratum histogram aggregate to that stratum's
    * quota column (a literal for [[stratifiedFixed]]; derived from
    * availability for [[mixtureSample]]).
    */
  /** Null-safe broadcast join on the stratum key. A `Seq(col)` USING join
    * drops NULL-stratum rows (null never equals null) — but a NULL
    * stratum is a legal partition that the one-phase window form sampled,
    * so membership parity across forms requires `<=>` here.
    */
  private def joinOnStratum(left: DataFrame, right: DataFrame,
      strataCol: String): DataFrame = {
    val r = right.withColumnRenamed(strataCol, "__strat_r")
    left.join(broadcast(r), col(strataCol) <=> col("__strat_r")).drop("__strat_r")
  }

  /** Null ids RAISE (the guard-before-use convention): a null id hashes
    * to a null rank/bucket, which would both vanish from the sample
    * silently and — in the two-phase form, if its count reaches the
    * quota — aggregate `__bmax` to NULL and zero out the whole stratum.
    */
  private def guardedU(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("__u",
      when(col(idCol).isNull, raise_error(lit(
        s"exact-n sampler: null $idCol — a null id has no hash rank; " +
          "filter or repair ids upstream")))
        .otherwise(unitHash(col(idCol))))

  private def bucketedCutoff(df: DataFrame, strataCol: String, idCol: String,
      quotaOf: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val bw = P31 / SelectionBuckets + 1
    val withU = guardedU(df, idCol)
      .withColumn("__b", floor(col("__u") / lit(bw)).cast("long"))
    val hist = withU.groupBy(col(strataCol), col("__b")).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(strataCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tiny by construction: ≤ strata × SelectionBuckets rows feed this
    // window, the aggregate-fed shape this repo pins everywhere
    val cuts = quotaOf(hist)
      .withColumn("__cum", sum("__c").over(wCum))
      .where(col("__cum") - col("__c") < col("__quota"))
      .groupBy(col(strataCol))
      .agg(max(col("__b")).as("__bmax"), max(col("__quota")).as("__quota"))
    (withU, cuts)
  }

  /** Phase-2 presample: rows joined to their stratum's broadcast cutoff
    * and filtered to the prefix buckets — the rank window's entire input.
    */
  private def presample(withU: DataFrame, cuts: DataFrame,
      strataCol: String): DataFrame =
    joinOnStratum(withU, cuts, strataCol).where(col("__b") <= col("__bmax"))

  /** Shared phase-2 tail of the three exact-n samplers: presample → rank
    * by (unit hash, id) within stratum → keep the quota. One definition,
    * so a fix here cannot drift between samplers.
    */
  private def rankAndCut(withU: DataFrame, cuts: DataFrame,
      strataCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__u"), col(idCol))
    presample(withU, cuts, strataCol)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("__quota"))
      .drop("__u", "__b", "__bmax", "__quota")
  }

  /** Session override for [[onePhaseMaxBytes]] (bytes, long). */
  val OnePhaseMaxBytesConf = "graft.sampler.onePhaseMaxBytes"

  /** Inputs whose OPTIMIZED-plan size estimate sits below this are sampled
    * one-phase. Default 256 MB: a couple of scan partitions' worth, where
    * the histogram's extra jobs, broadcast and re-scan cost more wall
    * clock than they save (measured ~3× at sf0.1 in round 9), while any
    * corpus big enough for a dominant stratum to serialize through one
    * window task is far above it. Same stats source as
    * `Dedup.ensureParallelism` — no physical planning is forced.
    */
  val DefaultOnePhaseMaxBytes: Long = 256L << 20

  private def onePhaseRegime(df: DataFrame): Boolean = {
    val cutoff = df.sparkSession.conf
      .getOption(OnePhaseMaxBytesConf).map(_.toLong)
      .getOrElse(DefaultOnePhaseMaxBytes)
    df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(cutoff)
  }

  /** One-phase tail: rank the FULL stratum by (u, id) and keep the joined
    * quota — the small-input regime. Membership AND ranks are identical
    * to [[rankAndCut]] by construction: the two-phase presample only ever
    * excludes rows hashing above every survivor, so full-stratum ranks of
    * the kept rows are unchanged (the property the parity spec pins).
    */
  private def rankAll(withU: DataFrame, quotas: DataFrame,
      strataCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__u"), col(idCol))
    joinOnStratum(withU, quotas, strataCol)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("__quota"))
      .drop("__u", "__quota")
  }

  /** Regime dispatch shared by the three exact-n samplers: `quotasFrom`
    * maps per-stratum availability `(strataCol, __avail)` to quotas
    * `(strataCol, __quota)` — ONE quota definition per sampler, consumed
    * by both physical forms, so the switch cannot change membership.
    * Small inputs rank directly (fewer jobs wins); large inputs go
    * through the bucketed-histogram cutoff (the rank window's input stays
    * ≈ quota + avail/[[SelectionBuckets]] per stratum).
    */
  private def samplePhased(df: DataFrame, strataCol: String, idCol: String,
      quotasFrom: DataFrame => DataFrame): DataFrame =
    if (onePhaseRegime(df)) {
      val withU = guardedU(df, idCol)
      val counts = withU.groupBy(col(strataCol)).agg(count(lit(1)).as("__avail"))
      rankAll(withU, quotasFrom(counts), strataCol, idCol)
    } else {
      val (withU, cuts) = bucketedCutoff(df, strataCol, idCol, hist =>
        joinOnStratum(hist,
          quotasFrom(hist.groupBy(col(strataCol)).agg(sum("__c").as("__avail"))),
          strataCol))
      rankAndCut(withU, cuts, strataCol, idCol)
    }

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

  /** JVM-side twin of [[unitHash]] (same two Lehmer steps) — for tests and
    * callers that need the membership decision off-plan.
    */
  def unitHashLong(id: Long): Long = {
    val s1 = Math.floorMod((Math.floorMod(id, P31) + 1) * 48271, P31)
    Math.floorMod(s1 * 48271, P31)
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

  /** Deterministic TRAIN/VAL/TEST split — the release-time partition every
    * training pipeline needs before anything touches an evaluation set.
    * Membership is a pure function of the id: the unit-hash line [0, 2³¹−1)
    * is cut at precomputed integer thresholds (cumulative fractions floored
    * ONCE on the driver and inlined as literals, so there is no per-row
    * float arithmetic to drift between engines or runs). Splits are
    * disjoint and layout/retry-stable by construction; rows above the last
    * threshold (when fractions sum below 1) are the unlabeled remainder
    * and are dropped — an explicit holdout, not a silent loss (the row
    * count contract is pinned in OpsSpec). NULL ids raise (a NULL id
    * cannot be assigned stably — the guard-before-use convention).
    *
    * Scale shape: stateless scan-stage projection + filter, zero
    * exchanges, same as [[hashSample]].
    */
  def splitLabels(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "splitLabels: no fractions given")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"splitLabels: duplicate split names in ${fractions.map(_._1)}")
    require(fractions.forall(_._2 > 0),
      s"splitLabels: non-positive fraction in $fractions")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"splitLabels: fractions sum past 1: ${fractions.map(_._2).sum}")
    val thresholds = splitThresholds(fractions.map(_._2))
    val label = fractions.zip(thresholds).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, ((name, _), thr)) =>
        when(col("__u") < thr, lit(name)).otherwise(acc)
      }
    guardedU(df, idCol).withColumn("split", label)
      .where(col("split").isNotNull).drop("__u")
  }

  /** The integer cut points of [[splitLabels]] on the [0, 2³¹−1) hash
    * line — public so the oracle SQL embeds the IDENTICAL literals. A
    * cumulative fraction within 1e-9 of 1 maps to the open upper bound
    * (every row below it belongs to the last split). */
  def splitThresholds(fractions: Seq[Double]): Seq[Long] =
    fractions.scanLeft(0.0)(_ + _).tail.map { c =>
      if (c >= 1.0 - 1e-9) P31 else math.floor(c * P31).toLong
    }

  /** Quality-WEIGHTED soft sampling: keep each row with probability equal
    * to its weight column (∈ [0, 1]), deterministically — membership is
    * `unitHash(id) < floor(w · (2³¹−1))`, a pure function of (id, w), so
    * the sample is retry/partitioning-stable and reproducible like
    * [[hashSample]] while high-quality documents survive at higher rates
    * (the quality-pacing pattern between a hard gate and keep-everything).
    * NULL or out-of-range weights raise on the scan (the guard-before-use
    * convention) — a silently-dropped NULL would bias the mixture.
    * Scale shape: stateless scan-stage filter, zero exchanges.
    */
  def weightedHashSample(df: DataFrame, idCol: String,
      weightCol: String): DataFrame = {
    val w = col(weightCol).cast("double")
    val guarded = when(w.isNull || w < 0 || w > 1,
      raise_error(concat(
        lit(s"weightedHashSample: $weightCol null or out of [0,1] at $idCol="),
        col(idCol).cast("string")))).otherwise(w)
    // explicit floor: Spark's cast-to-long truncates but DuckDB's CAST
    // rounds half-even — floor is the one spelling both engines share
    df.withColumn("u", unitHash(col(idCol)))
      .where(col("u") < floor(guarded * P31).cast("long"))
  }

  /** Exactly-n-per-stratum deterministic sample: the `n` rows with the
    * smallest (unit hash, id) inside each stratum — a uniform shuffle
    * order that is stable across runs — with the rank emitted as `rk`.
    * Oversampling guard: a stratum with fewer than `n` rows keeps all.
    *
    * Scale shape (two-phase, exact): phase 1 histograms the corpus by
    * (stratum, hash bucket) — a map-side-combined aggregate whose shuffle
    * carries ≤ strata × [[SelectionBuckets]] rows — and a tiny prefix-sum
    * window picks each stratum's exact cutoff bucket; phase 2 re-scans,
    * keeps only rows at-or-below the broadcast cutoff (a scan-stage
    * filter), and rank-orders the ≈ n + avail/buckets survivors. The rank
    * window never sees the corpus, so a 90%-of-rows dominant stratum costs
    * one small task, not one corpus-sized one. Ranks equal the
    * full-stratum ranks because every excluded row hashes above every
    * survivor; membership is identical to the one-phase form by
    * construction (no slack, no failure mode to guard). A NULL stratum is
    * a legal partition sampled like any other — the cutoff joins are
    * null-safe `<=>`, where a USING join would silently drop those rows.
    *
    * Below [[DefaultOnePhaseMaxBytes]] (plan-stats estimate, overridable
    * via [[OnePhaseMaxBytesConf]]) the sampler ranks the full stratum
    * directly instead — at that size the histogram's extra jobs cost more
    * than they save, and membership/ranks are identical either way
    * (parity-pinned in OpsSpec).
    */
  def stratifiedFixed(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    samplePhased(df, strataCol, idCol,
      counts => counts.select(col(strataCol), lit(n.toLong).as("__quota")))
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
    * Scale shape: per-source availability, the feasibility min, and the
    * quotas all derive from phase 1's (stratum, hash bucket) histogram —
    * tiny aggregates — and the exact cutoff-bucket machinery of
    * [[stratifiedFixed]] (with the computed quota as n) keeps the rank
    * window's input at ≈ quota + avail/buckets rows per stratum instead of
    * the corpus: the dominant source of a real mixture never serializes
    * through one task.
    */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], default: Double = 0.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && default >= 0,
      "mixture weights must be non-negative")
    require((weights.values.toSeq :+ default).exists(_ > 0),
      "at least one mixture weight must be positive")
    val wt = weights.foldLeft(lit(default)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(w)).otherwise(acc) }
    samplePhased(df, strataCol, idCol, { counts0 =>
      val counts = counts0.withColumn("__wt", wt).where(col("__wt") > 0)
      val tmax = counts.agg(min(col("__avail").cast("double") / col("__wt")).as("__t"))
      counts.crossJoin(broadcast(tmax))
        .select(col(strataCol), floor(col("__t") * col("__wt")).cast("long").as("__quota"))
    })
  }

  /** TOKEN-budgeted corpus mixture — real mixture specs budget TOKENS, not
    * documents ("30% code by tokens"): the largest feasible total is
    * `T = min_i tokenAvail_i / w_i` (availability measured in tokens), each
    * source's token quota is `⌊T · w_i⌋`, and a source admits its
    * hash-ordered document prefix while the INCLUSIVE running token total
    * stays ≤ quota — the first document that would overflow the quota is
    * CUT (documents are atomic; an admitted-then-truncated document would
    * not be a document any more). Zero-token documents inside the admitted
    * prefix are kept (they cost nothing); NULL/negative token counts raise
    * (a silently-nulled sum would zero a source's availability and bias
    * the whole mixture). Emits `cumTokens` (the inclusive running total)
    * for audit, like [[hashSample]] emits `u`.
    *
    * Scale shape — the same two-phase trick as [[stratifiedFixed]], with
    * token SUMS in place of row counts (the [[Budget]] bucketed-prefix-sum
    * idea applied per stratum): phase 1 histograms per (source, hash
    * bucket) token sums — a map-side-combined aggregate, ≤ strata ×
    * [[SelectionBuckets]] rows — and a tiny aggregate-fed window picks each
    * source's cutoff bucket (the last whose PRECEDING cumulative tokens ≤
    * quota — `≤`, not `<`, so a zero-token document landing exactly on the
    * quota boundary stays reachable); phase 2 re-scans, keeps only
    * prefix-bucket rows, and runs the exact running-token window over the
    * ≈ quota-tokens-worth of survivors. The dominant source of a real
    * mixture never serializes through one corpus-sized window task. Below
    * the [[onePhaseRegime]] cutoff the running sum ranks the full stratum
    * directly — membership identical by construction (every excluded row's
    * preceding cumulative already exceeds the quota), parity-pinned in
    * OpsSpec.
    */
  def mixtureSampleTokens(df: DataFrame, strataCol: String, idCol: String,
      tokenCol: String, weights: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && default >= 0,
      "mixture weights must be non-negative")
    require((weights.values.toSeq :+ default).exists(_ > 0),
      "at least one mixture weight must be positive")
    val wt = weights.foldLeft(lit(default)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(w)).otherwise(acc) }
    val tok = when(col(tokenCol).isNull || col(tokenCol) < 0,
      raise_error(concat(
        lit(s"mixtureSampleTokens: $tokenCol null or negative at $idCol="),
        col(idCol).cast("string"))))
      .otherwise(col(tokenCol).cast("long"))
    def quotasFrom(avails: DataFrame): DataFrame = { // (strataCol, __avail) in TOKENS
      val counts = avails.withColumn("__wt", wt).where(col("__wt") > 0)
      val tmax = counts.agg(min(col("__avail").cast("double") / col("__wt")).as("__t"))
      counts.crossJoin(broadcast(tmax))
        .select(col(strataCol), floor(col("__t") * col("__wt")).cast("long").as("__quota"))
    }
    val withU = guardedU(df, idCol).withColumn("__tok", tok)
    val wRun = Window.partitionBy(col(strataCol)).orderBy(col("__u"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if (onePhaseRegime(df)) {
      val avails = withU.groupBy(col(strataCol)).agg(sum("__tok").as("__avail"))
      joinOnStratum(withU, quotasFrom(avails), strataCol)
        .withColumn("cumTokens", sum("__tok").over(wRun))
        .where(col("cumTokens") <= col("__quota"))
        .drop("__u", "__tok", "__quota")
    } else {
      val bw = P31 / SelectionBuckets + 1
      val bucketed = withU.withColumn("__b", floor(col("__u") / lit(bw)).cast("long"))
      val hist = bucketed.groupBy(col(strataCol), col("__b"))
        .agg(sum("__tok").as("__tc"))
      val quotas = quotasFrom(
        hist.groupBy(col(strataCol)).agg(sum("__tc").as("__avail")))
      val wCum = Window.partitionBy(col(strataCol)).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // tiny by construction: ≤ strata × SelectionBuckets rows feed this
      // window, the aggregate-fed shape this repo pins everywhere
      val cuts = joinOnStratum(hist, quotas, strataCol)
        .withColumn("__cum", sum("__tc").over(wCum))
        .where(col("__cum") - col("__tc") <= col("__quota"))
        .groupBy(col(strataCol))
        .agg(max(col("__b")).as("__bmax"), max(col("__quota")).as("__quota"))
      joinOnStratum(bucketed, cuts, strataCol).where(col("__b") <= col("__bmax"))
        .withColumn("cumTokens", sum("__tok").over(wRun))
        .where(col("cumTokens") <= col("__quota"))
        .drop("__u", "__b", "__bmax", "__tok", "__quota")
    }
  }

  /** Diagnostic: the number of rows phase 2's rank window actually
    * receives for an exact-n sample — the serialization measure that
    * matters at cluster scale, where a window partition is one task on
    * one core. The naive one-phase form feeds the FULL corpus to the
    * per-stratum window (its dominant stratum = one task); the two-phase
    * form feeds ≈ n + avail/[[SelectionBuckets]] per stratum. Used by
    * tools.StressX10's dominant-stratum row.
    */
  def rankWindowInputRows(df: DataFrame, strataCol: String, idCol: String, n: Int): Long = {
    val (withU, cuts) = bucketedCutoff(df, strataCol, idCol,
      hist => hist.withColumn("__quota", lit(n.toLong)))
    presample(withU, cuts, strataCol).count()
  }

  /** Diagnostic sibling of [[rankWindowInputRows]]: the rows through the
    * BUSIEST window task under a forced shard count — the per-task ceiling
    * a cluster inherits, measured rather than argued. Both forms are
    * repartitioned by the window's own partitioning key into `numShards`
    * shards (a window partition never splits across tasks, so hashing the
    * stratum key is exactly what the window exchange does); returns
    * (two-phase max task rows, naive max task rows). The naive ceiling is
    * bounded BELOW by the dominant stratum — no shard count can shrink it —
    * while the two-phase ceiling tracks presample survivors.
    */
  def rankWindowTaskCeiling(df: DataFrame, strataCol: String, idCol: String,
      n: Int, numShards: Int): (Long, Long) = {
    val (withU, cuts) = bucketedCutoff(df, strataCol, idCol,
      hist => hist.withColumn("__quota", lit(n.toLong)))
    def maxTask(d: DataFrame): Long =
      d.repartition(numShards, col(strataCol))
        .select(spark_partition_id().as("__p"))
        .groupBy("__p").agg(count(lit(1)).as("__c"))
        .agg(max("__c")).first().getLong(0)
    (maxTask(presample(withU, cuts, strataCol)), maxTask(withU))
  }

  /** TEMPERATURE-scaled mixture — the multilingual-sampling standard
    * (sampling probability ∝ availᵢ^τ): source weights are the corpus's
    * own availability counts raised to `tau`, then pushed through the
    * same largest-feasible-total quota machinery as [[mixtureSample]] —
    * `T = min_i availᵢ/wᵢ`, `quotaᵢ = ⌊T·wᵢ⌋`. Weight normalization
    * cancels inside `T·wᵢ`, so wᵢ = availᵢ^τ is used unnormalized.
    * τ = 1 keeps every source whole (proportional = the corpus itself);
    * τ → 0 flattens toward uniform, so high-resource sources are cut
    * hardest and the scarcest source always keeps everything.
    *
    * The quota adds a RELATIVE 1e-12 plus absolute 1e-9 epsilon before
    * the floor: `pow` on doubles is the one place this file leaves
    * integer arithmetic, and the guard keeps a last-ulp difference
    * between engines from flipping the floor when `T·wᵢ` lands on an
    * exact integer (it does for the scarcest source, where `T·wᵢ =
    * availᵢ`). The relative term matters because one ulp of a large
    * product exceeds any absolute epsilon — at availᵢ = 10⁸,
    * ulp ≈ 1.5·10⁻⁸ > 10⁻⁹ — while 1e-12 relative still cannot reach
    * the next integer for any count below ~10¹² (floor flips only if
    * ε·availᵢ ≥ 1). Same two-phase scale shape as [[stratifiedFixed]]:
    * the rank window only ever sees presample survivors.
    */
  def mixtureSampleTemperature(df: DataFrame, strataCol: String, idCol: String,
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau out of (0,1]: $tau")
    samplePhased(df, strataCol, idCol, { counts0 =>
      val counts = counts0
        .withColumn("__wt", pow(col("__avail").cast("double"), lit(tau)))
      val tmax = counts.agg(min(col("__avail").cast("double") / col("__wt")).as("__t"))
      counts.crossJoin(broadcast(tmax))
        .select(col(strataCol),
          floor(col("__t") * col("__wt") * lit(1 + 1e-12) + lit(1e-9))
            .cast("long").as("__quota"))
    })
  }

  /** Deterministic epoch shuffle + shard: the "reshuffle the corpus each
    * training epoch" step. Every row gets a shard in `[0, nShards)` and a
    * stable position inside its shard, both pure integer functions of
    * `(id, epoch)` — so the ordering is identical on any cluster layout,
    * after any retry, and reproducible from the epoch number alone; a new
    * epoch permutes everything. Scale shape: ONE shuffle on the shard key
    * and per-shard windows running in parallel — here the window partition
    * count is user-sized (thousands of shards), so per-partition windows
    * genuinely scale, unlike a per-SOURCE window (see [[stratifiedFixed]]);
    * a naive global `ORDER BY rand()` would both serialize and be
    * unreproducible. At
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
  /** Repetition-aware per-source UPSAMPLING — the data-recipe shape of
    * LLaMA-class pre-training mixes ("wikipedia: 2.5 epochs, crawl: 0.8"):
    * each document of source `s` is materialized `floor(f_s)` times
    * (epochs 1..floor), and the fractional remainder is a deterministic
    * hash sample — documents whose [[unitHash]] falls below
    * `frac(f_s) × 2³¹` carry one extra epoch row. Factor 0 drops the
    * source. The fractional cut reuses the SAME unit-hash line as every
    * other sampler (cuts floored ONCE on the driver, inlined as integer
    * literals), so membership is layout/retry-stable and composes with
    * the split/sample family's determinism guarantees.
    *
    * Output = input columns + `epoch` (1-based int); downstream epoch
    * shuffling/sharding treats each (doc, epoch) row independently.
    *
    * Scale shape: one scan-stage projection + filter + a row-local
    * explode whose fan-out is the epoch factor (bounded by the recipe,
    * not the data) — zero exchanges, no state, stream-safe.
    */
  def epochUpsample(df: DataFrame, sourceCol: String, idCol: String,
      factors: Map[String, Double], default: Double = 1.0): DataFrame = {
    (factors.values.toSeq :+ default).foreach(f =>
      require(f >= 0 && f <= 1000, s"epoch factor out of [0,1000]: $f"))
    def full(f: Double) = lit(math.floor(f).toInt)
    def cut(f: Double) = lit(((f - math.floor(f)) * P31).toLong)
    val fullCol = factors.foldLeft(full(default)) { case (acc, (s, f)) =>
      when(col(sourceCol) === s, full(f)).otherwise(acc)
    }
    val cutCol = factors.foldLeft(cut(default)) { case (acc, (s, f)) =>
      when(col(sourceCol) === s, cut(f)).otherwise(acc)
    }
    val n = fullCol +
      when(unitHash(col(idCol)) < cutCol, lit(1)).otherwise(lit(0))
    df.withColumn("__eu_n", n)
      // sequence(1, 0) would DESCEND in Spark — guard empties explicitly
      .withColumn("epoch",
        explode(when(col("__eu_n") >= 1, sequence(lit(1), col("__eu_n")))
          .otherwise(array().cast("array<int>"))))
      .drop("__eu_n")
  }

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
