package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Materialize.MaterializeOps

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
    * `·48271 mod P57` of `h + 1`. The DEFINING form is the exact
    * DECIMAL(38,0) chain (the product exceeds int64; DuckDB replays it
    * in HUGEINT), but the shipped column computes the same values in
    * pure int64 via Schrage's decomposition inside whole-stage codegen
    * ([[graft.functions.TextHashOps.lehmerMix]]; LehmerMixSpec pins
    * value equality on the full long line, so the oracle mirror and the
    * persisted sketches are untouched). ONE definition shared by the
    * one-shot estimator, the per-shard sketch builder, the merger, and
    * the streaming running sketch, so persisted sketches and live
    * estimates can't drift.
    */
  def mixedPosition(h: Column): Column =
    graft.functions.TextFunctions.lehmer_mix(h.cast("long"), 2)

  private def mixedExpr: Column = mixedPosition(col("__kv_h"))

  /** Scalar twin of [[mixedPosition]] — the SAME two Lehmer rounds for
    * driver-side consumers (streaming watch-key cell precompute), so a
    * change to the column-side mix cannot silently desynchronize them.
    */
  def mixedPositionLong(h: Long): Long =
    graft.functions.TextHashOps.lehmerMix(h, 2)

  /** Scalar twin of [[mixedPosition2]] (the third Lehmer round). */
  def mixedPosition2Long(h: Long): Long =
    graft.functions.TextHashOps.lehmerMix(h, 3)

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
    // checkpoint: three consumers (exact count, bucket histogram, the
    // survivor cut) each re-planned the scan+explode+distinct — their
    // differing downstream aggregates defeat exchange-reuse
    // canonicalization, so the corpus pass ran THREE times (r20 plan
    // audit: 3 identical `Scan parquet`+Generate subtrees, zero
    // ReusedExchange). The materialized frame is the distinct-position
    // set — sketch-input-sized, far below the raw corpus.
    val dm = df.select(col(groupCol).as("__kv_g"), h.as("__kv_h"))
      .select(col("__kv_g"), mixedExpr.as("__kv_m")).distinct()
      .materialized
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

  /** KMV SET ALGEBRA (Beyer et al. 2007): pairwise union / intersection /
    * Jaccard estimates between groups, computed ENTIRELY from the
    * persisted k-minima — no corpus rescan, which is the whole point:
    * "how much do src A and src B overlap?" answered from two k-long
    * arrays. For each group pair, the combined sketch `K = k smallest of
    * K(A) ∪ K(B)` estimates the union by the standard k-th-minimum rule
    * (exact when |K| < k — both sketches were partial, so K IS the
    * union set); `ĵ = |K ∩ K(A) ∩ K(B)| / |K|` estimates Jaccard
    * (members of the combined sketch are a uniform sample of the union;
    * each is in the intersection iff both sketches saw it), and the
    * intersection estimate is the integer `|K∩…| · û DIV |K|`. All
    * integer/array arithmetic — the DuckDB oracle replays it from the
    * same sketch rule. Output `(gA, gB, n_union_est, n_inter_est,
    * jaccard_est)` for every gA < gB pair.
    *
    * Scale shape: one k-array row per group; the pair expansion is
    * #groups² rows of 3·k longs — sketch algebra, corpus never touched.
    *
    * Accepts MULTIPLE sketch rows per group (the per-shard
    * [[kmvSketch]] form): shard k-minima are merged per group first —
    * union, keep the k smallest distinct ([[kmvMergeEstimate]]'s rule,
    * lossless by the superset property) — so feeding per-shard rows
    * yields the same pairs/estimates as feeding pre-merged ones, not
    * duplicate pairs with shard-partial estimates.
    */
  def kmvSetOps(sketches: DataFrame, groupCol: String,
      k: Int = MaxK): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k out of [2, $MaxK]: $k")
    val merged = sketches
      .select(col(groupCol).as("__so_g"), explode(col("positions")).as("__so_m"))
      .groupBy("__so_g")
      // collect_set dedups cross-shard repeats; sort+slice keeps the k
      // smallest — for already-merged input (one row, sorted, ≤ k) this
      // is the identity, so single-sketch callers see no change
      .agg(slice(array_sort(collect_set(col("__so_m"))), 1, k).as("positions"))
    val a = merged.select(col("__so_g").as("gA"), col("positions").as("pA"))
    val b = merged.select(col("__so_g").as("gB"), col("positions").as("pB"))
    a.join(b, col("gA") < col("gB"))
      .select(col("gA"), col("gB"),
        slice(array_sort(array_union(col("pA"), col("pB"))), 1, k).as("pk"),
        col("pA"), col("pB"))
      .select(col("gA"), col("gB"),
        size(col("pk")).as("__nk"),
        when(size(col("pk")) < k, size(col("pk")).cast("long"))
          .otherwise(expr(
            s"CAST((${(k - 1).toLong} * ${P57}L) DIV element_at(pk, $k) AS BIGINT)"))
          .as("n_union_est"),
        size(array_intersect(array_intersect(col("pk"), col("pA")), col("pB")))
          .as("__ni"))
      .select(col("gA"), col("gB"), col("n_union_est"),
        expr("CAST((__ni * n_union_est) DIV __nk AS BIGINT)").as("n_inter_est"),
        round(col("__ni").cast("double") / col("__nk").cast("double"), 6)
          .as("jaccard_est"))
  }

  // --------------------------------------------------------------------
  // Bloom membership filter — the cheapest "have I seen this?" serve tier
  // --------------------------------------------------------------------

  /** Third Lehmer round on the P57 line — the double-hashing step
    * generator. [[mixedPosition]] gives round 2; one more multiplication
    * keeps the walk on the line. Same long-exact Schrage implementation
    * of the defining DECIMAL(38,0) chain (DuckDB replays that in
    * HUGEINT; LehmerMixSpec pins equality).
    */
  def mixedPosition2(h: Column): Column =
    graft.functions.TextFunctions.lehmer_mix(h.cast("long"), 3)

  private def checkBloomParams(mBits: Int, kHashes: Int): Unit = {
    require(mBits >= 64 && mBits % 32 == 0,
      s"mBits must be >= 64 and a multiple of 32: $mBits")
    require(kHashes >= 1 && kHashes <= 16, s"kHashes out of [1, 16]: $kHashes")
  }

  /** The `kHashes` bit positions of a key hash, by classic double hashing
    * (Kirsch & Mitzenmacher 2006): `pos_i = (h1 + i·h2) mod m` with
    * `h1 = mix(h) mod m` and `h2 = 1 + (mix2(h) mod (m−1))` (step forced
    * nonzero so the k probes never collapse onto one bit). Both mixes are
    * Lehmer rounds mod P57 — one shared definition across build, merge,
    * probe, and the DuckDB oracle.
    */
  private def bloomPositions(h: Column, mBits: Int, kHashes: Int): Column =
    // let-bind the Lehmer rounds: HOF lambdas re-evaluate captured
    // expressions per element, so an unbound h1/h2 would recompute the
    // mix k times per row (measured ~4x the whole sketch cost on the CMS
    // twin when the mix was still the DECIMAL(38,0) chain; the int64
    // Schrage kernel is cheaper but the k-fold recompute is still waste)
    graft.functions.Exprs.let2(
      pmod(mixedPosition(h), lit(mBits.toLong)),
      pmod(mixedPosition2(h), lit((mBits - 1).toLong)) + lit(1L),
      (h1, h2) => transform(sequence(lit(0), lit(kHashes - 1)),
        i => pmod(h1 + i.cast("long") * h2, lit(mBits.toLong))))

  /** Build a Bloom filter over `hashCol` values as a DISTRIBUTED bit
    * table `(word, bits)` — 32 live bits per row (masks stay positive
    * int64 on both engines), `mBits/32` rows TOTAL regardless of corpus
    * size. That fixed size is the whole point at 100 TB: a 2³⁰-bit
    * filter over 10¹¹ fingerprints is 32 M rows / 128 MiB — broadcast
    * range for the probe side, where the fingerprint table itself would
    * be a corpus-sized shuffle.
    *
    * Scale shape: one distinct on the hash, a k-way row-local explode,
    * one map-side-combined `bit_or` keyed by word. NULL hashes raise (a
    * null has no membership); absent words mean all-zero bits.
    */
  def bloomSketch(df: DataFrame, hashCol: Column, mBits: Int = 65536,
      kHashes: Int = 4): DataFrame = {
    checkBloomParams(mBits, kHashes)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.bloomSketch: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    df.select(h.as("__bf_h")).distinct()
      .select(explode(bloomPositions(col("__bf_h"), mBits, kHashes)).as("__bf_p"))
      .groupBy((col("__bf_p") / 32).cast("long").as("word"))
      .agg(bit_or(expr("shiftleft(1L, CAST(pmod(__bf_p, 32) AS INT))"))
        .as("bits"))
  }

  /** Per-shard Bloom bit tables `(shard, word, bits)` — the PERSISTABLE
    * form. Bloom's mergeability is exact: OR of per-shard bit tables ==
    * the one-shot filter over the union (bit-identically — the shared
    * oracle row proves it), so shards build independently (once per
    * day/crawl) and [[bloomMerge]] folds them at serve time.
    */
  def bloomShardSketch(df: DataFrame, shardCol: String, hashCol: Column,
      mBits: Int = 65536, kHashes: Int = 4): DataFrame = {
    checkBloomParams(mBits, kHashes)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.bloomShardSketch: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    df.select(col(shardCol).as("__bf_s"), h.as("__bf_h")).distinct()
      .select(col("__bf_s"),
        explode(bloomPositions(col("__bf_h"), mBits, kHashes)).as("__bf_p"))
      .groupBy(col("__bf_s").as(shardCol),
        (col("__bf_p") / 32).cast("long").as("word"))
      .agg(bit_or(expr("shiftleft(1L, CAST(pmod(__bf_p, 32) AS INT))"))
        .as("bits"))
  }

  /** OR-merge per-shard Bloom tables into one `(word, bits)` filter. */
  def bloomMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("word").agg(bit_or(col("bits")).as("bits"))

  /** Collect a `(word, bits)` Bloom table into a dense driver-side word
    * array — the input of [[bloomMaybeMember]]'s zero-join serve form.
    * DRIVER-SIZED by definition (`mBits/32` longs: 256 KiB at 2²⁶ bits);
    * guard your `mBits` accordingly — the join-based [[bloomProbe]] is
    * the path for filters too big to ship as a literal.
    */
  def bloomBitsArray(sketch: DataFrame, mBits: Int): Array[Long] = {
    require(mBits >= 64 && mBits % 32 == 0,
      s"mBits must be >= 64 and a multiple of 32: $mBits")
    val words = new Array[Long](mBits / 32)
    sketch.select(col("word").cast("long"), col("bits").cast("long"))
      .collect().foreach { r =>
        val w = r.getLong(0)
        require(w >= 0 && w < words.length, s"word index $w out of range for mBits=$mBits")
        words(w.toInt) = r.getLong(1)
      }
    words
  }

  /** ROW-LOCAL Bloom membership test against a literal word array — the
    * cheapest possible serve: zero joins, zero shuffles, zero state, so
    * it drops straight into a streaming `where` (the admission-gate twin)
    * or a scan-stage filter. Same double-hash walk as build/probe; the
    * word array is embedded as a literal (broadcast with the plan), which
    * caps practical `mBits` at a few times 2²⁶ — beyond that, use
    * [[bloomProbe]]'s join form.
    */
  def bloomMaybeMember(hashCol: Column, words: Array[Long], mBits: Int,
      kHashes: Int = 4): Column = {
    checkBloomParams(mBits, kHashes)
    require(words.length == mBits / 32,
      s"word array length ${words.length} != mBits/32 = ${mBits / 32}")
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.bloomMaybeMember: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    forall(bloomPositions(h, mBits, kHashes), p => {
      val word = element_at(typedLit(words.toSeq), floor(p / 32).cast("int") + 1)
      // mask via exact double pow (2^b, b <= 31, exact in IEEE double) —
      // Column shifts take only literal shift amounts
      val mask = pow(lit(2.0), pmod(p, lit(32L)).cast("int")).cast("long")
      word.bitwiseAND(mask) =!= lit(0L)
    })
  }

  /** Probe a Bloom filter: `(id, maybe_member)` per batch key — true iff
    * ALL k bits are set. No false negatives ever (inserted keys always
    * probe true — spec-pinned); false positives at the standard
    * `(1−e^{−kn/m})^k` rate, which the caller prices in (a Bloom gate
    * admits a few duplicates, never drops an original — the safe
    * direction for a dedup admission filter).
    *
    * Scale shape: k row-local positions per key, one join keyed by
    * `word` against the FIXED-SIZE bit table (broadcast when it fits —
    * it is `mBits/32` rows no matter the corpus), then a k-row-per-key
    * map-side-combined `min`. An absent word row is all-zero bits
    * (coalesce, not a dropped key).
    */
  def bloomProbe(batch: DataFrame, idCol: String, hashCol: Column,
      sketch: DataFrame, mBits: Int = 65536, kHashes: Int = 4): DataFrame = {
    checkBloomParams(mBits, kHashes)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.bloomProbe: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    batch.select(col(idCol).as("__bf_id"), h.as("__bf_h"))
      .select(col("__bf_id"),
        explode(bloomPositions(col("__bf_h"), mBits, kHashes)).as("__bf_p"))
      .withColumn("word", (col("__bf_p") / 32).cast("long"))
      .join(sketch, Seq("word"), "left")
      .select(col("__bf_id"),
        when(expr("shiftright(coalesce(bits, 0L), CAST(pmod(__bf_p, 32) AS INT)) & 1L") === 1L,
          lit(1)).otherwise(lit(0)).as("__bf_hit"))
      .groupBy(col("__bf_id").as(idCol))
      .agg((min(col("__bf_hit")) === 1).as("maybe_member"))
  }

  // --------------------------------------------------------------------
  // Count-min sketch — fixed-size frequency estimates, overestimate-only
  // --------------------------------------------------------------------

  private def checkCmsParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth out of [1, 16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
  }

  /** Column position of a key hash in CMS row `r` — the same double-hash
    * walk as [[bloomPositions]], reduced mod `width`. One definition for
    * build, lookup, and oracle.
    */
  private def cmsPosition(m1: Column, m2: Column, r: Column, width: Int): Column = {
    val h1 = pmod(m1, lit(width.toLong))
    val h2 = pmod(m2, lit((width - 1).toLong)) + lit(1L)
    pmod(h1 + r.cast("long") * h2, lit(width.toLong))
  }

  /** Project the two mixed positions ONCE per input row, before the
    * depth-way explode — the Generate boundary keeps the DECIMAL mix
    * chain from being re-evaluated per (row × depth).
    */
  private def withMix(df: DataFrame, h: Column): DataFrame =
    df.select(mixedPosition(h).as("__m1"), mixedPosition2(h).as("__m2"))

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of `hashCol`
    * OCCURRENCES (bag semantics — no distinct: frequency is the point):
    * `depth × width` counters as `(r, c, cnt)` rows. Fixed size however
    * large the corpus — the 100 TB shape is "count every token/n-gram
    * once into d·w cells, answer any frequency later without re-reading
    * the corpus". Estimates only ever OVERCOUNT (collisions add), never
    * undercount — the deterministic half of the CMS guarantee, pinned by
    * spec and visible in the oracle row's `over` column.
    *
    * Scale shape: a depth-way row-local explode into one map-side-
    * combined count keyed by (r, c) — ≤ depth·width result rows.
    */
  def cmsSketch(df: DataFrame, hashCol: Column, depth: Int = 4,
      width: Int = 2048): DataFrame = {
    checkCmsParams(depth, width)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.cmsSketch: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    withMix(df, h)
      .select(col("__m1"), col("__m2"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"), cmsPosition(col("__m1"), col("__m2"), col("r"), width).as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-shard CMS `(shard, r, c, cnt)`. Counters are plain sums, so
    * [[cmsMerge]] (counter-wise add) is LOSSLESS: merged shards ==
    * one-shot sketch, cell-identically.
    */
  def cmsShardSketch(df: DataFrame, shardCol: String, hashCol: Column,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    checkCmsParams(depth, width)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.cmsShardSketch: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    df.select(col(shardCol).as("__cm_s"), mixedPosition(h).as("__m1"),
        mixedPosition2(h).as("__m2"))
      .select(col("__cm_s"), col("__m1"), col("__m2"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("__cm_s").as(shardCol), col("r"),
        cmsPosition(col("__m1"), col("__m2"), col("r"), width).as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum-merge per-shard CMS tables into one `(r, c, cnt)` sketch. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))

  /** Point-query a CMS: `(id, n_est)` per probe key — the MINIMUM of the
    * key's `depth` counters (a missing cell is 0: the key was never
    * counted). `n_est >= true count` always.
    *
    * Scale shape: depth rows per probe key joined against the
    * fixed-size (≤ depth·width rows — broadcastable always) counter
    * table, one map-side-combined `min` per key.
    */
  def cmsLookup(keys: DataFrame, idCol: String, hashCol: Column,
      cms: DataFrame, depth: Int = 4, width: Int = 2048): DataFrame = {
    checkCmsParams(depth, width)
    val h = when(hashCol.isNull, raise_error(lit(
        "Sketch.cmsLookup: null hash — filter upstream")))
      .otherwise(hashCol.cast("long"))
    keys.select(col(idCol).as("__cm_id"), mixedPosition(h).as("__m1"),
        mixedPosition2(h).as("__m2"))
      .select(col("__cm_id"), col("__m1"), col("__m2"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("c", cmsPosition(col("__m1"), col("__m2"), col("r"), width))
      .join(broadcast(cms), Seq("r", "c"), "left")
      .groupBy(col("__cm_id").as(idCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  // --------------------------------------------------------------------
  // Histogram quantile sketch — mergeable fixed-bucket quantiles
  // --------------------------------------------------------------------

  private def checkHistParams(lo: Long, hi: Long, nBuckets: Int): Unit = {
    require(hi > lo, s"hi must exceed lo: [$lo, $hi)")
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets out of [2, 2^20]: $nBuckets")
    require(BigInt(hi) - BigInt(lo) <= BigInt(Long.MaxValue / nBuckets),
      s"(hi - lo) * nBuckets overflows int64: [$lo, $hi) x $nBuckets")
  }

  /** Exact integer division of two long Columns — Catalyst's
    * `IntegralDivide` (SQL `DIV`), built from the Columns themselves so
    * callers aren't forced onto a magic alias. Double `/` would round
    * above 2^53; this stays exact across the whole int64 line.
    */
  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Bucket id of a value on the fixed `[lo, hi)` grid — integer
    * arithmetic only (`DIV`, no double rounding), clamped to the edge
    * buckets so out-of-range values are COUNTED (in the first/last
    * bucket), not dropped: a quantile sketch that silently drops
    * outliers lies about the tails. Built from the `v` Column itself
    * (not a fixed alias), so any caller-side column works.
    */
  private[graft] def histBucket(v: Column, lo: Long, hi: Long, nBuckets: Int): Column = {
    // clamp BEFORE the multiply: an unclamped far-out value would overflow
    // (v - lo) * nBuckets and die in an ANSI ArithmeticException instead of
    // landing in the edge bucket as documented; post-clamp the product is
    // bounded by (hi - lo) * nBuckets, guarded at parameter check
    val b = intDiv(
      (least(lit(hi), greatest(lit(lo), v.cast("long"))) - lit(lo)) * lit(nBuckets.toLong),
      lit(hi - lo))
    least(lit(nBuckets - 1L), greatest(lit(0L), b))
  }

  /** Per-group fixed-bucket histogram `(group, bucket, cnt)` over a
    * numeric column — the mergeable quantile sketch (sum-merge, like
    * CMS). ≤ groups × nBuckets rows whatever the corpus size; the
    * quantile answer is off by at most ONE BUCKET WIDTH — a bound set
    * at build time by (hi−lo)/nBuckets, not by data luck. The exact
    * sibling ([[Quantile]] / `d_length_quantiles`) re-sorts values per
    * query; this is the amortized production shape: histogram once per
    * shard, merge + read quantiles for free thereafter.
    *
    * Scale shape: one row-local bucket map, one map-side-combined count.
    * NULL values raise (they have no position on the value line).
    */
  def histSketch(df: DataFrame, groupCol: String, valueCol: String,
      lo: Long, hi: Long, nBuckets: Int = 64): DataFrame = {
    checkHistParams(lo, hi, nBuckets)
    val v = when(col(valueCol).isNull, raise_error(lit(
        "Sketch.histSketch: null value — filter upstream")))
      .otherwise(col(valueCol).cast("long"))
    df.select(col(groupCol).as("__hs_g"), v.as("__hs_v"))
      .groupBy(col("__hs_g").as(groupCol),
        histBucket(col("__hs_v"), lo, hi, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-(group × shard) histogram `(group, shard, bucket, cnt)` — the
    * persistable form; [[histMerge]] sum-merges losslessly.
    */
  def histShardSketch(df: DataFrame, groupCol: String, shardCol: String,
      valueCol: String, lo: Long, hi: Long, nBuckets: Int = 64): DataFrame = {
    checkHistParams(lo, hi, nBuckets)
    val v = when(col(valueCol).isNull, raise_error(lit(
        "Sketch.histShardSketch: null value — filter upstream")))
      .otherwise(col(valueCol).cast("long"))
    df.select(col(groupCol).as("__hs_g"), col(shardCol).as("__hs_s"),
        v.as("__hs_v"))
      .groupBy(col("__hs_g").as(groupCol), col("__hs_s").as(shardCol),
        histBucket(col("__hs_v"), lo, hi, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum-merge per-shard histograms into `(group, bucket, cnt)`. */
  def histMerge(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(groupCol, "bucket").agg(sum(col("cnt")).as("cnt"))

  /** Read percentile estimates off a histogram sketch: for each group ×
    * percentile (integer percent — no float q, so both engines rank
    * identically), the UPPER EDGE of the first bucket whose cumulative
    * count reaches `ceil(pct·n/100)` — a value guaranteed >= the true
    * pct-quantile and < it + one bucket width (when the data lies in
    * `[lo, hi)`; clamped edge buckets widen only the outermost answers).
    * Output `(group, pct, n, n_le_est, est)` with `n_le_est` the
    * cumulative count at the chosen bucket (the realized rank — honest
    * reporting, like KMV's rel_err).
    *
    * Scale shape: windows run over ≤ nBuckets rows per group (the
    * sketch, never the corpus) crossed with the percentile literals.
    */
  def histQuantiles(hist: DataFrame, groupCol: String, pcts: Seq[Int],
      lo: Long, hi: Long, nBuckets: Int = 64): DataFrame = {
    checkHistParams(lo, hi, nBuckets)
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles out of [1, 100]: $pcts")
    val wCum = Window.partitionBy(groupCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__hq_cum", sum(col("cnt")).over(wCum))
      .withColumn("__hq_n", sum(col("cnt")).over(Window.partitionBy(groupCol)))
    val spark = hist.sparkSession
    import spark.implicits._
    val probes = cum.crossJoin(broadcast(pcts.toDF("pct")))
    probes
      .where(col("__hq_cum") >= expr("(__hq_n * pct + 99L) DIV 100L"))
      .groupBy(col(groupCol), col("pct"), col("__hq_n").as("n"))
      .agg(min(struct(col("bucket"), col("__hq_cum"))).as("__hq_b"))
      .select(col(groupCol), col("pct"), col("n"),
        col("__hq_b.__hq_cum").as("n_le_est"),
        (lit(lo) + expr(
          s"((__hq_b.bucket + 1L) * ${hi - lo}L) DIV ${nBuckets}L")).as("est"))
  }
}
