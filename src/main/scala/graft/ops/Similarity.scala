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

  /** ±1 sign of LSH banding hyperplane `p` (0-based) at dimension `i`
    * (1-based) — the [[projSign]] mixing (two modular squares, all
    * intermediates < 2⁶²) under its OWN salt and bit, so banding planes
    * and JL-projection planes are independent families and the DuckDB
    * oracle can recompute the exact matrix in overflow-checked BIGINT
    * (OracleFrag.bandSignSql) — data-independent, reproducible, no
    * stored model.
    *
    * This replaces the original affine generator (one Lehmer step on
    * `a·p + b·i + c`): adjacent plane rows there differ by a constant
    * pre-bit-extraction shift and correlate heavily — planes 11-15
    * measured PAIRWISE |corr| = 1.0, mean 0.60 over the first 16 — so a
    * band of `planes` sign bits collapsed to ~2-4 effective buckets
    * (half the corpus in one bucket per degenerate band), and at a 100×
    * corpus the candidate set measured 57% of ALL pairs: the LSH
    * bounded nothing and every cosine probe degenerated toward
    * all-pairs verification. The earlier "banding only needs per-plane
    * balance" rationale was wrong: bucket entropy IS cross-plane
    * independence. bandSign rows measure mean |corr| 0.098 ≈ the 1/√64
    * independent level across the 120 planes the widest banding uses.
    */
  /** Version of the banding-plane formula family. A persisted band index
    * is only probeable by the formula generation that built it — probing
    * across generations produces buckets that match by 2^-planes chance,
    * i.e. SILENT recall collapse, not an error. [[graft.ops.Dedup.cosineIndex]]
    * stamps this (plus its planes/bands parameters) into the index
    * schema's `bucket` field metadata (survives parquet round-trips);
    * every prober validates and raises on mismatch. v1 = the affine
    * one-step Lehmer generator (never stamped — indexes from it predate
    * stamping and must be re-banded); v2 = [[bandSign]] below.
    */
  val BandFormatVersion: Long = 2L

  def bandSign(p: Int, i: Int): Double = {
    val P31 = 2147483647L
    val s = (1000003L * p + 7919L * i + 54321L) % P31
    val x1 = (s * s) % P31
    val x2 = ((x1 + s) * 48271L) % P31
    val x3 = (x2 * x2) % P31
    if (((x3 >> 17) & 1L) == 1L) 1.0 else -1.0
  }

  /** Deterministic ±1 hyperplane row as a constant-folded literal. Plane
    * vectors are truncated to the data's dimension by DotProduct's
    * min-length loop.
    */
  private def signRow(p: Int): Column =
    array((1 to MaxDims).map(i => lit(bandSign(p, i))): _*)

  /** Bucket id = packed sign bits of `planes` projections starting at
    * plane `firstPlane` (first plane = most significant bit). Distinct
    * `firstPlane` offsets give independent bands for OR-amplified LSH.
    */
  def hyperplaneBucket(v: Column, planes: Int, firstPlane: Int = 0): Column =
    (firstPlane until firstPlane + planes).foldLeft(lit(0L)) { (acc, p) =>
      shiftleft(acc, 1).bitwiseOR(
        when(dot_product(v, signRow(p)) > 0, 1L).otherwise(0L))
    }

  /** Constant-occupancy band width: the planes/band that keeps the
    * EXPECTED vectors-per-bucket near `targetPerBucket` at a corpus of
    * `corpusSize` vectors — the smallest `planes` with
    * `2^planes ≥ corpusSize / targetPerBucket`, clamped to
    * `[minPlanes, maxPlanes]`.
    *
    * This is the operating rule banded cosine LSH needs at scale: a
    * band's bucket count is `2^planes` REGARDLESS of corpus size, so
    * holding planes fixed while the corpus grows 10× grows bucket
    * occupancy — and candidate pairs per probe — ~10× (quadratically for
    * within-corpus pairing). Growing planes with log2(corpus) instead
    * holds occupancy constant: measured across 1×/10×/100× indexes
    * (tools.StressX100, 8/12/15 planes), the SAME incremental-dedup
    * probe is ≤1.3×/decade under this rule vs 2.1× in its first decade
    * with planes held at 8. Size every new index with this; the oracle
    * pins band parameters per query, so RE-sizing an existing index
    * means re-banding it (one pass over stored vectors), not mutating
    * it in place.
    *
    * `maxPlanes` ≤ 62 because a bucket id is the packed sign bits in one
    * long ([[hyperplaneBucket]]); the default cap 30 (~10⁹ buckets/band)
    * is past any single-index size this engine should serve unpartitioned.
    */
  def planesForCorpus(corpusSize: Long, targetPerBucket: Int = 8,
      minPlanes: Int = 4, maxPlanes: Int = 30): Int = {
    require(corpusSize >= 0, s"corpusSize must be >= 0: $corpusSize")
    require(targetPerBucket >= 1, s"targetPerBucket must be >= 1: $targetPerBucket")
    require(minPlanes >= 1 && minPlanes <= maxPlanes && maxPlanes <= 62,
      s"need 1 <= minPlanes <= maxPlanes <= 62: [$minPlanes, $maxPlanes]")
    // exact integer form of ceil(log2(ceil(corpusSize / target))): no
    // double rounding at the 2^k boundaries, and no `2^planes * target`
    // product that could wrap past 2^63 at wide planes
    val neededBuckets =
      if (corpusSize == 0) 0L else (corpusSize - 1) / targetPerBucket + 1
    var planes = 0
    while (planes < maxPlanes && (1L << planes) < neededBuckets) planes += 1
    math.max(minPlanes, planes)
  }

  /** Constant-cell-size IVF list count — the IVF analogue of
    * [[planesForCorpus]]: the nlist that keeps the EXPECTED vectors per
    * coarse cell near `targetCellSize` at a corpus of `corpusSize`
    * vectors — `ceil(corpusSize / targetCellSize)`, clamped to
    * `[minNlist, maxNlist]`.
    *
    * Why constant cell size and not the classic √n: RecallX100 measured
    * both probe policies over 1×/10×/100× corpora under constant cell
    * size, and the recall lever turned out to be the PROBED FRACTION,
    * not the cell count form — constant-fraction probing held and then
    * exceeded its 1× recall (0.47 → 0.73 → 0.98) while constant-count
    * probing decayed (0.47 → 0.24). Constant cell size makes that
    * policy's cost model linear and legible: a probe touches
    * `nprobe × targetCellSize` candidates exactly, cells stay
    * hash-partitionable at any corpus, and re-sizing an index is one
    * re-assignment pass (like re-banding under [[planesForCorpus]]).
    * √n cells would instead grow BOTH the cell size and the cell count
    * with the corpus, so neither the per-cell scan nor the centroid
    * broadcast stays constant.
    *
    * The default target 125 reproduces the long-gated 16-cell layout at
    * the sf0.1 corpus (2000 vectors) — the shipped parameters before
    * this rule existed — and scales it linearly beyond (20k → 160
    * cells, 2M → 16k cells). `maxNlist` bounds the broadcast centroid
    * table (2²⁰ centroids × 64 dims ≈ 0.5 GiB, the practical broadcast
    * ceiling); past it, partition the corpus and shard the index.
    */
  def nlistForCorpus(corpusSize: Long, targetCellSize: Int = 125,
      minNlist: Int = 8, maxNlist: Int = 1 << 20): Int = {
    require(corpusSize >= 0, s"corpusSize must be >= 0: $corpusSize")
    require(targetCellSize >= 1, s"targetCellSize must be >= 1: $targetCellSize")
    require(minNlist >= 1 && minNlist <= maxNlist,
      s"need 1 <= minNlist <= maxNlist: [$minNlist, $maxNlist]")
    val cells =
      if (corpusSize == 0) 0L else (corpusSize - 1) / targetCellSize + 1
    math.max(minNlist.toLong, math.min(maxNlist.toLong, cells)).toInt
  }

  /** Constant-probed-fraction nprobe policy: probe `ceil(nCells /
    * probeDen)` cells — a fixed 1/probeDen of the index — clamped to
    * `[minProbe, nCells]`.
    *
    * This is the measured recall-HOLDING policy (RecallX100, 1×/10×/100×
    * corpora): probing a constant fraction of ever-finer cells held
    * recall@10 at 0.47 → 0.73 → 0.98 while a constant nprobe decayed to
    * 0.24 at 10×. The price is explicit and linear — candidates per
    * query ≈ corpus/probeDen under [[nlistForCorpus]]'s constant cell
    * size — which is the honest cost of held recall ("recall you hold,
    * you pay for"); a deployment that prefers constant cost per query
    * should pin nprobe and accept the documented decay curve instead.
    */
  def nprobeForCells(nCells: Int, probeDen: Int = 4, minProbe: Int = 2): Int = {
    require(nCells >= 1, s"nCells must be >= 1: $nCells")
    require(probeDen >= 1, s"probeDen must be >= 1: $probeDen")
    require(minProbe >= 1, s"minProbe must be >= 1: $minProbe")
    math.min(nCells, math.max(minProbe, (nCells + probeDen - 1) / probeDen))
  }

  /** The SHARD-COUNT probe term (r20 — the rule the r19 verdict's item
    * #4 anticipated, measured before shipping): per-shard nprobe =
    * `ceil(nprobeForCells(cells) · (4 + log2(nShards)) / 2)`, identity
    * at nShards = 1.
    *
    * Why a term exists at all: sharding restricts ASSIGNMENT — a corpus
    * vector whose best union cell lives in another shard lands in a
    * worse own-shard cell, which ranks lower in the query's probe order
    * — so the equal-budget sharded index sits measurably below the
    * unsharded router (100× decade, seeded: 0.907/0.856/0.833 at
    * nShards 2/4/8 vs 0.976 unsharded; identical under per-shard and
    * global allocation, which ruled allocation out). The calibration
    * grid (RecallX100 `GRAFT_RECALL_PROBE_SCALE`) measured the
    * multipliers against BOTH bars: the unsharded-SEEDED 0.976 is
    * bought back at ×2/≈×2.2/×2.5 (nShards 2/4/8), but the
    * unsharded-TRAINED bar is 1.000 and the trained-sharded rows need
    * ×2.5 at nShards=2 to come within 0.02 of it (0.961 at ×2 → 0.984
    * at ×2.5, 0.996 at ×3). The shipped rule (4 + log2 ns)/2 =
    * ×2.5/×3/×3.5 meets the trained criterion at every measured point
    * (seeded reads 0.987/0.997/≥0.993 there). The cost is explicit and
    * linear — candidates per query scale by the same multiplier — the
    * policy family's standing trade ("recall you hold, you pay for"):
    * sharding buys the broadcast ceiling and the 1/nShards assignment
    * scan, and pays the probe premium.
    */
  def nprobeShardedForCells(nCells: Int, nShards: Int): Int = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val base = nprobeForCells(nCells)
    // ceil(log2) for non-power-of-2 shard counts — round the premium up
    val log2 = 32 - Integer.numberOfLeadingZeros(nShards - 1 max 0)
    val num = if (nShards == 1) 2 else 4 + log2
    math.min(nCells, (base * num + 1) / 2)
  }

  /** The expected per-query candidate population an IVF probe ranks:
    * `floor(corpusSize · nProbe / nCells)` under [[nlistForCorpus]]'s
    * near-uniform cells. This is the population whose ADC/decode ranking
    * noise a refine budget must absorb — the input to
    * [[refineForCandidates]] for the cell-routed tiers (the exhaustive
    * PQ/SQ8 tiers rank the whole corpus, so their candidates ARE the
    * corpus count). Multiply-before-divide keeps the integer rule exact
    * and SQL-mirrorable; corpus·nProbe stays far under 2⁶³ for any
    * single index this engine serves unpartitioned (maxNlist 2²⁰).
    */
  def expectedProbed(corpusSize: Long, nCells: Int, nProbe: Int): Long = {
    require(corpusSize >= 0, s"corpusSize must be >= 0: $corpusSize")
    require(nCells >= 1, s"nCells must be >= 1: $nCells")
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells: [$nProbe, $nCells]")
    // enforce, don't just assert in prose: a pathological corpusSize
    // would WRAP the product silently and size a wrong refine budget —
    // contrary to the family's raise-not-wrap convention
    require(corpusSize <= Long.MaxValue / nProbe,
      s"corpusSize * nProbe would overflow int64: $corpusSize * $nProbe")
    corpusSize * nProbe / nCells
  }

  /** The shipped refine denominator — ONE constant shared by
    * [[refineForCandidates]]'s default and OracleFrag.refineCte's SQL
    * default, so the Scala rule and its DuckDB mirror cannot drift.
    * Chosen from the r17 RecallX100 recall-vs-den table in BENCH_NOTES.
    */
  val RefineDen = 16

  /** Constant-fraction exact-rescore budget — the refine analogue of
    * [[nprobeForCells]]'s constant probed fraction: rescore
    * `ceil(candidates / refineDen)` of the approximately-ranked pool,
    * floored at `minRefine` (the long-gated refine-30 operating point)
    * and capped at `maxRefine` (past ~2¹⁶ exact rescores per query the
    * refine tail rivals the compressed scan it was meant to avoid — grow
    * kCode/subspaces instead at that point).
    *
    * Why a FRACTION and not the fixed 30: RecallX100 measured IVF-PQ at
    * a fixed refine-30 trading recall DOWN with corpus growth even under
    * held routing recall (trained centroids, constant probed fraction:
    * 0.236 → 0.122 → 0.047 across 1×/10×/100×) — with 16 codes per
    * 8-dim subspace the ADC ranking noise scales with the ranked pool,
    * so the true top-k drifts below any constant cutoff. Holding the
    * cutoff AS A FRACTION of the pool absorbs that drift; the measured
    * recall-vs-den table in BENCH_NOTES (r17) is the spec for the
    * default, exactly as the RecallX100 probe table is for
    * [[nprobeForCells]].
    */
  def refineForCandidates(candidates: Long, refineDen: Int = RefineDen,
      minRefine: Int = 30, maxRefine: Int = 1 << 16): Int = {
    require(candidates >= 0, s"candidates must be >= 0: $candidates")
    require(refineDen >= 1, s"refineDen must be >= 1: $refineDen")
    require(minRefine >= 1 && minRefine <= maxRefine,
      s"need 1 <= minRefine <= maxRefine: [$minRefine, $maxRefine]")
    val frac = if (candidates == 0) 0L else (candidates - 1) / refineDen + 1
    math.max(minRefine.toLong, math.min(maxRefine.toLong, frac)).toInt
  }

  /** Corpus-adaptive PQ codebook RESOLUTION — the last ANN dial that was
    * a constant: centroids per subspace codebook, `ceil(corpusSize /
    * targetPerCode)` clamped to `[minKCode, maxKCode]`.
    *
    * Why the codebook must grow with the corpus: with `kCode` centroids
    * per `subDim`-dim subspace, ADC ranks candidates on m·log2(kCode)
    * bits of signal, so the ADC ranking noise is a fixed FRACTION of the
    * ranked pool — the r17 RecallX100 table measured IVF-PQ recall at
    * kCode=16 stuck at 0.593 at a 100× corpus even under held routing
    * (trained centroids, constant probed fraction) and an adaptive
    * refine absorbing 1/16 of the pool, while plain IVF reached 1.000:
    * past a point, MORE REFINE cannot recover rank signal the 4-bit
    * codes never encoded. Growing kCode with the corpus holds the
    * per-candidate code resolution in step with the population the ADC
    * must separate; the r18 RecallX100 column is the measured spec
    * (kCode 16 → 160 → 256 across 1×/10×/100×).
    *
    * The default target 125 reproduces the long-gated kCode=16 at the
    * sf0.1 corpus (2000 vectors) — the [[nlistForCorpus]] convention:
    * the rule's floor IS the shipped historical parameter. `maxKCode`
    * 256 is the one-BYTE code ceiling (classic 8-bit PQ): past it a code
    * no longer fits the m-bytes-per-vector storage story, and the right
    * next dial is more subspaces (m) or the SQ8 tier, not a wider
    * codebook. Cost shape: the encode pass is corpus·m·kCode subspace
    * dots — linear in kCode, paid once per build (or per query set in
    * the in-flight form); the ADC scan itself never touches kCode (one
    * lookup per (candidate, subspace)).
    */
  def kCodeForCorpus(corpusSize: Long, targetPerCode: Int = 125,
      minKCode: Int = 16, maxKCode: Int = 256): Int = {
    require(corpusSize >= 0, s"corpusSize must be >= 0: $corpusSize")
    require(targetPerCode >= 1, s"targetPerCode must be >= 1: $targetPerCode")
    require(minKCode >= 1 && minKCode <= maxKCode,
      s"need 1 <= minKCode <= maxKCode: [$minKCode, $maxKCode]")
    val codes =
      if (corpusSize == 0) 0L else (corpusSize - 1) / targetPerCode + 1
    math.max(minKCode.toLong, math.min(maxKCode.toLong, codes)).toInt
  }

  /** The rule PAST the kCode = 256 byte ceiling (r19 — the r18 verdict's
    * named frontier: at `n ≥ 32k·baseM/8` per the clamp, the codebook
    * RESOLUTION dial goes constant again, the same shape kCode=16 had
    * before r18): grow the SUBSPACE COUNT `m` instead. The invariant the
    * two rules jointly hold is `m · kCode ≥ ceil(corpusSize /
    * targetPerCode)` — total codebook centroids track the population the
    * ADC must separate; kCode grows first (free at serve time: the ADC
    * scan never touches kCode), and once it caps at one byte, m doubles
    * (each doubling halves subDim, so 256 codes cover an easier,
    * lower-dimensional subspace — the standard PQ refinement axis).
    *
    * Explicit costs of the m dial, so the trade is chosen, not implied:
    * compressed storage is m bytes/vector (16 at the first doubling —
    * still 16× under raw floats), the ADC scan is m lookups/candidate
    * (linear in m), and the build-time encode is corpus·m·kCode rows —
    * which is why the serving story for this rule is the PERSISTED
    * index family ([[writePqIndex]]/[[writeIvfPqIndex]]): encode is
    * build state, paid once. Endpoint: m caps at `dims` (subDim = 1 —
    * 256-level per-dimension codes, which IS the SQ8 tier with a trained
    * codebook per dim); past that point the family has no finer PQ dial
    * and the right move is the SQ8/raw tiers. The r19 RecallX100 row at
    * 200× (the first decade where the rule moves: needed = 3200 > 256·8)
    * is the measured spec, exactly as the r18 table was for
    * [[kCodeForCorpus]].
    */
  def mForCorpus(corpusSize: Long, dims: Int = 64, baseM: Int = 8,
      targetPerCode: Int = 125, maxKCode: Int = 256): Int = {
    require(corpusSize >= 0, s"corpusSize must be >= 0: $corpusSize")
    require(dims >= 1 && baseM >= 1 && baseM <= dims,
      s"need 1 <= baseM <= dims: [$baseM, $dims]")
    require(dims % baseM == 0, s"baseM $baseM must divide dims $dims")
    require(targetPerCode >= 1 && maxKCode >= 1,
      s"targetPerCode/maxKCode must be >= 1: [$targetPerCode, $maxKCode]")
    val needed =
      if (corpusSize == 0) 0L else (corpusSize - 1) / targetPerCode + 1
    var m = baseM
    while (m.toLong * maxKCode < needed && m * 2 <= dims && dims % (m * 2) == 0)
      m *= 2
    m
  }

  /** Compression-tier selection — the [[mForCorpus]] endpoint specified
    * as a RULE (r20, the r19 verdict's item #8, measured first):
    * serve PQ while `mForCorpus(n) ≤ dims/8`, switch to the SQ8 tier
    * past it.
    *
    * The measured basis (RecallX100, trained routing + adaptive refine
    * at every row — BENCH_NOTES r20): PQ never wins on recall-per-cost
    * in this family — IVF-SQ8 reads 1.000 recall at BOTH the 100× and
    * 200× decades (67.5 / 143.5 s in-flight) while IVF-PQ at the m = 8
    * floor caps at 0.946/0.964 under a byte-capped codebook and needs
    * the m = 16 doubling to match 1.000 at 200×, at 11.4× the SQ8 cost
    * (1631.3 s — the corpus·m·kCode encode scan; amortizable at build,
    * but the ADC serve premium remains). PQ's value is BYTES: m
    * bytes/vector vs SQ8's dims. While the resolution invariant
    * m·kCode ≥ ceil(n/125) holds at m ≤ dims/8, that advantage is ≥ 8×
    * and PQ is the memory lever; the first forced doubling past dims/8
    * halves the advantage while compounding the cost premium — so the
    * boundary sits exactly where [[mForCorpus]] first moves past
    * dims/8. At dims = 64 the switch lands at n > 256,000 vectors
    * (needed > 256·8), between the measured decades — the table
    * brackets it from both sides. Pinned by IvfSizingProps: tier is PQ
    * iff mForCorpus(n) ≤ dims/8, monotone in n, and the returned PQ m
    * always satisfies the joint invariant.
    */
  def compressionTierForCorpus(corpusSize: Long, dims: Int = 64,
      baseM: Int = 8): String = {
    val m = mForCorpus(corpusSize, dims, baseM)
    if (m.toLong * 8 <= dims) "pq" else "sq8"
  }

  /** Multi-probe bucket list: the exact bucket plus `probes` variants with
    * the WEAKEST sign bits flipped (smallest |projection| = the planes the
    * vector sits closest to, i.e. the likeliest misclassifications —
    * standard multi-probe LSH). Query-side only: recall rises without
    * touching the corpus index or adding bands. Returns array<long> of
    * 1 + probes buckets.
    */
  def hyperplaneProbes(v: Column, planes: Int, firstPlane: Int, probes: Int): Column = {
    require(probes >= 0 && probes <= planes, "probes must be in [0, planes]")
    // per-plane dots via the one-pass kernel (bit-identical to the
    // per-plane DotProduct folds — BandKernelSpec's parity argument)
    val dots = graft.functions.BandFunctions.plane_dots(v, planes, "band", firstPlane)
    graft.functions.Exprs.let(dots, ds => {
      val bucket = (0 until planes).foldLeft(lit(0L)) { (acc, j) =>
        shiftleft(acc, 1).bitwiseOR(
          when(element_at(ds, j + 1) > 0, 1L).otherwise(0L))
      }
      graft.functions.Exprs.let(bucket, b => {
        // rank plane positions by |dot| ascending; flip the weakest bits
        val ranked = sort_array(transform(sequence(lit(0), lit(planes - 1)),
          j => struct(abs(element_at(ds, j + 1)).as("a"), j.as("j"))))
        val flips = transform(slice(ranked, 1, probes), s =>
          b.bitwiseXOR(
            pow(lit(2.0), (lit(planes - 1) - s.getField("j")).cast("double"))
              .cast("long")))
        concat(array(b), flips)
      })
    })
  }

  private def prep(df: DataFrame, idName: String): DataFrame =
    df.select(col(idName),
      transform(col("vec"), _.cast("double")).as(s"${idName}_v"))
      .withColumn(s"${idName}_n", norm(col(s"${idName}_v")))

  /** Shared exact-rescore tail of every candidate-cut ANN variant: re-join
    * the (qid, cid) candidate pairs to their vectors, score the exact
    * cosine, and keep the per-query top-k (ties broken by cid). Candidates
    * shuffled before this point carry ids only — vectors join in here.
    */
  private def rescoreTopK(cand: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val scored = cand
      .join(prep(queries, "qid"), "qid")
      .join(prep(corpus, "cid"), "cid")
      .select(col("qid"), col("cid"),
        round(dot_product(col("qid_v"), col("cid_v")) /
          (col("qid_n") * col("cid_n")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** [[rescoreTopK]] over candidates that ALREADY carry the corpus vector
    * (`qid, cid, vec`) — the persisted-layout serves: their probed-cell
    * scan has `vec` in hand, so re-joining the store by cid (a second
    * directory read plus an exchange) is pure waste (r21, guide §2.4).
    * Same cosine formula, rounding and ties as [[rescoreTopK]].
    */
  private def rescoreTopKWithVec(cand: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val scored = cand
      .join(prep(queries, "qid"), "qid")
      .withColumn("cid_v", transform(col("vec"), _.cast("double")))
      .select(col("qid"), col("cid"),
        round(dot_product(col("qid_v"), col("cid_v")) /
          (col("qid_n") * norm(col("cid_v"))), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

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

  /** ANN top-k via banded hyperplane LSH (OR-amplification): a candidate
    * is scored if it shares ANY of `bands` independent
    * `planesPerBand`-bit buckets with the query.
    *
    * The two knobs trade recall against bucket size — recall ≈
    * 1-(1-(1-θ/π)^planesPerBand)^bands (measured on the sf0.01 fixture:
    * recall@5 0.43/0.73/0.76 at 2/4/8 bands with 4 planes — OpsSpec pins
    * the monotonicity and the ≥0.7 default). The 100 TB playbook:
    *  - recall too low → add bands (linear candidate cost, exponential
    *    miss-probability decay); multi-probe (flipping the weakest sign
    *    bit) is the next step beyond bands;
    *  - buckets too big (hot-bucket skew: dense embedding regions hash
    *    together) → add planes per band: each plane halves the expected
    *    bucket; AQE's skew-join split handles residual stragglers since
    *    the in-bucket join is a plain shuffle join on (band, bucket);
    *  - candidate shuffle stays id-only either way — vectors re-join
    *    AFTER pair dedup, so widening bands never ships vectors per band.
    */
  def lshTopKBanded(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      planesPerBand: Int = 4,
      bands: Int = 4,
      probes: Int = 0, // query-side multi-probe bit flips per band
  ): DataFrame = {
    // band shuffle carries ids only; vectors re-join after pair dedup (the
    // per-side frames are small relative to candidate rows — AQE broadcasts).
    // Banding runs through the one-pass bucket kernel (bit-identical to the
    // defining hyperplaneBucket folds — BandKernelSpec).
    def banded(df: DataFrame, id: String) =
      prep(df, id).select(col(id), posexplode(
          graft.functions.BandFunctions.band_buckets(col(s"${id}_v"), planesPerBand, bands)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    // the query side probes (1+probes) buckets per band; the corpus index
    // is untouched — multi-probe trades a little query fan-out for recall
    def bandedProbed(df: DataFrame, id: String) = {
      val probeLists = array((0 until bands).map(b =>
        hyperplaneProbes(col(s"${id}_v"), planesPerBand, b * planesPerBand, probes)): _*)
      prep(df, id).select(col(id), posexplode(probeLists))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "buckets"))
        .select(col(id), col("band"), explode(col("buckets")).as("bucket"))
    }
    val qSide = if (probes == 0) banded(queries, "qid") else bandedProbed(queries, "qid")
    val cand = qSide.join(banded(corpus, "cid"), Seq("band", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    rescoreTopK(cand, queries, corpus, k)
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into `nCells`
    * cells — each vector assigned to its nearest centroid by cosine — then
    * probe only the `nProbe` nearest cells per query and run exact top-k
    * inside them. The classic candidate-cut shape: corpus scan cost is one
    * broadcast-centroid pass, the probe join touches ~nProbe/nCells of the
    * corpus, and cells are hash-partitionable on centId at any scale.
    *
    * The quantizer is SEEDED (centroids = the corpus vectors with the
    * `nCells` smallest ids): deterministic, so the DuckDB oracle mirrors
    * assignment + probing exactly. Swapping in k-means centroids changes
    * only the `cent` frame — assignment/probe/scoring plumbing is
    * identical (a trained quantizer is not oracle-expressible, which is
    * why the seeded one is the gated variant).
    */
  /** Lloyd-iterated k-means centroids over the corpus (cosine assignment,
    * element-wise mean update). Init = the seeded centroids, so iters = 0
    * reproduces the oracle-gated variant exactly. Mean aggregation is
    * float-order dependent, so TRAINED centroids are for the recall/skew
    * unit gate, not the hash oracle — which is precisely why [[ivfTopK]]
    * keeps the seeded quantizer as its gated default. At scale each
    * iteration is one broadcast-centroid pass + one groupBy(centId):
    * linear, shuffle-light, and the centroid frame stays tiny.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int = 16, iters: Int = 5,
      dims: Int = 0): DataFrame = {
    val c = prep(corpus, "cid")
    // derive the dimension from the data unless given — a hardcoded width
    // over shorter vectors would mean-aggregate nulls into the centroids
    val d = if (dims > 0) dims
      else corpus.select(size(col("vec"))).head.getInt(0)
    var cent = c.where(col("cid") < nCells)
      .select(col("cid").cast("int").as("centId"), col("cid_v").as("cent_v"),
        col("cid_n").as("cent_n"))
    for (_ <- 1 to iters) {
      // argmax aggregate, not a row_number window: partial aggregation
      // collapses the |corpus|·nCells scored rows map-side (the
      // nearestCells keep=1 rule); the winning cell then re-joins its
      // vector by id for the mean update
      val assigned = c.crossJoin(broadcast(cent))
        .select(col("cid"), col("centId"),
          (dot_product(col("cid_v"), col("cent_v")) /
            (col("cid_n") * col("cent_n"))).as("csim"))
        .groupBy(col("cid"))
        .agg(max_by(col("centId"),
          struct(col("csim"), (-col("centId")).as("negId"))).as("centId"))
        .join(c.select(col("cid"), col("cid_v")), "cid")
      val updated = assigned.groupBy("centId")
        .agg(array((0 until d).map(i =>
          avg(element_at(col("cid_v"), i + 1))): _*).as("new_v"))
      // Lloyd edge cases: an empty cluster (no winning assignment) or a
      // zero-mean cluster (norm 0 → NaN similarity) keeps its previous
      // centroid instead of vanishing / poisoning the ranking
      cent = cent.select(col("centId"), col("cent_v").as("old_v"))
        .join(updated, Seq("centId"), "left")
        .select(col("centId"),
          when(col("new_v").isNull || norm(col("new_v")) === 0, col("old_v"))
            .otherwise(col("new_v")).as("cent_v"))
        .withColumn("cent_n", norm(col("cent_v")))
        // the frame is ≤ nCells rows but its plan nests every prior
        // iteration — truncate lineage so each action runs training once
        .localCheckpoint(true)
    }
    cent
  }

  /** Nearest-centroid assignment of every corpus vector — (cid, centId).
    * The balance of these cells is what decides IVF probe cost and skew.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    nearestCells(prep(corpus, "cid"), "cid", centroids, keep = 1)

  /** Seeded coarse quantizer: centroids = the `nCells` smallest-id corpus
    * vectors (prepped frame in). Deterministic → oracle-expressible.
    */
  private def seededCentroids(c: DataFrame, nCells: Int): DataFrame =
    c.where(col("cid") < nCells)
      .select(col("cid").as("centId"), col("cid_v").as("cent_v"), col("cid_n").as("cent_n"))

  /** Per-row `keep` nearest centroids by cosine (ties → smallest centId).
    * keep=1 is corpus cell assignment; keep=nProbe is the query probe list.
    * One broadcast-centroid pass — no corpus shuffle.
    *
    * The keep=1 path — the CORPUS-sized one at scale (every vector ×
    * every centroid) — is an argmax AGGREGATE (`max_by` over the
    * (csim, −centId) pair: same winner, same smallest-centId ties as the
    * window form), not a row_number window: partial aggregation collapses
    * the |corpus|·nlist scored rows map-side to |corpus| rows before any
    * exchange, where the window form shuffled and sorted ALL scored rows
    * (measured 541 s for a 200k×1600-cell assignment in the r16
    * RecallX100 run — the aggregate form is the fix). keep>1 (the
    * query-side probe list, queries ≪ corpus) keeps the top-N window.
    */
  private def nearestCells(df: DataFrame, id: String, cent: DataFrame,
      keep: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cent))
      .select(col(id), col("centId"),
        (dot_product(col(s"${id}_v"), col("cent_v")) /
          (col(s"${id}_n") * col("cent_n"))).as("csim"))
    if (keep == 1)
      scored.groupBy(col(id))
        .agg(max_by(col("centId"),
          struct(col("csim"), (-col("centId")).as("negId"))).as("centId"))
        .select(col(id), col("centId"))
    else {
      val w = Window.partitionBy(col(id)).orderBy(col("csim").desc, col("centId"))
      scored
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= keep)
        .select(col(id), col("centId"))
    }
  }

  def ivfTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      centroids: Option[DataFrame] = None, // (centId, cent_v, cent_n); e.g. kmeansCentroids
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val cent = centroids.getOrElse(seededCentroids(c, nCells))
    val assigned = nearestCells(c, "cid", cent, keep = 1)
    val probed = nearestCells(prep(queries, "qid"), "qid", cent, keep = nProbe)
    // keep=1 assignment puts each cid in exactly one cell and the probe
    // window emits distinct (qid, centId) rows, so pairs are already
    // unique — the ivfPqTopK argument; no distinct() exchange (r21)
    val cand = probed.join(assigned, "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    rescoreTopK(cand, queries, corpus, k)
  }

  /** Persist an IVF index: the corpus written PARTITIONED BY coarse cell
    * (hive layout, one directory per centId) plus the centroid table.
    * This is the build-offline / serve-online split of real ANN serving:
    * assignment cost is paid once at write, and a probe of nProbe/nCells
    * cells prunes to nProbe/nCells partition DIRECTORIES — files in
    * unprobed cells are never opened, unlike the in-memory form where
    * pruning happens after the scan. Results are identical to [[ivfTopK]]
    * with the same quantizer (assignment is deterministic), so the same
    * DuckDB oracle gates both.
    */
  def writeIvfIndex(corpus: DataFrame, path: String, nCells: Int = 16,
      centroids: Option[DataFrame] = None): Unit = {
    val c = prep(corpus, "cid")
    val cent = centroids.getOrElse(seededCentroids(c, nCells))
    val assigned = nearestCells(c, "cid", cent, keep = 1)
    corpus.join(assigned, "cid")
      .write.partitionBy("centId").parquet(s"$path/cells")
    // stamp the cell count into the centroid table's schema metadata
    // (the writeSq8Index convention): nlist IS build-time metadata, and
    // the stamp lets the serve size its probe policy with a schema read
    // instead of a count job over the centroid table (r21)
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.nlist", cent.count()).build()
    cent.select(col("centId").as("centId", stamp), col("cent_v"),
        col("cent_n"))
      .write.parquet(s"$path/centroids")
  }

  /** Query a [[writeIvfIndex]] layout: probe the nProbe nearest cells per
    * query; both the candidate scan and the exact-rescore vector join read
    * ONLY the probed cell directories (partition pruning on centId).
    *
    * `nProbe = -1` (the default) applies [[nprobeForCells]] to the
    * INDEX's own cell count — the centroid table the layout already
    * carries, nlist rows, so serving never runs a sizing job over the
    * corpus-sized store: the nlist chosen at build time IS the index
    * metadata the probe policy needs.
    */
  def ivfTopKIndexed(queries: DataFrame, path: String,
      k: Int = 10, nProbe: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    val cent = spark.read.parquet(s"$path/centroids")
    val np =
      if (nProbe != -1) nProbe
      else {
        // nlist from the build-time schema stamp — zero jobs (r21); a
        // pre-r21 unstamped index falls back to the old count job
        val md = cent.schema("centId").metadata
        if (md.contains("graft.nlist"))
          nprobeForCells(md.getLong("graft.nlist").toInt)
        else nprobeForCells(cent.count().toInt)
      }
    val probed = nearestCells(prep(queries, "qid"), "qid", cent, keep = np)
    val cells = spark.read.parquet(s"$path/cells")
    // restrict once to the union of probed cells (per-query restriction
    // happens in the candidate join) — the one store read: candidates
    // carry `vec` straight from this scan into the rescore (r21; the
    // former shape re-joined the store by cid for the vectors and
    // distinct()-ed pairs that keep=1 assignment already made unique)
    val probedCells = cells.join(broadcast(probed.select("centId").distinct()), "centId")
    val cand = probedCells.join(probed, "centId")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("vec"))
    rescoreTopKWithVec(cand, queries, k)
  }

  // --------------------------------------------------------------------
  // Sharded IVF — the 100 TB path PAST the single-index broadcast ceiling.
  // [[nlistForCorpus]]'s maxNlist (2²⁰ cells ≈ 0.5 GiB of broadcast
  // centroids) bounds one index at ~131M vectors under the constant-cell
  // rule; a corpus of billions of embeddings must be hash-partitioned
  // into shards, each carrying its OWN constant-cell index, with probes
  // fanning out per shard and one global exact re-rank at the end. Every
  // stage stays the single-index shape: centroids broadcast PER SHARD
  // (each under the ceiling), assignment is an argmax aggregate, the
  // candidate shuffle carries ids only.

  /** Shard of an id under `nShards` hash partitions — `pmod(id, n)`, the
    * deterministic, oracle-expressible stand-in for a production hash
    * partitioner (for the synthetic contiguous ids it IS uniform).
    */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(id, lit(nShards.toLong))

  /** Per-shard seeded coarse quantizer: shard `s` gets the `nCells`
    * vectors with ids `s, s+nShards, …, s+(nCells−1)·nShards` — i.e. the
    * `nShards·nCells` smallest ids dealt round-robin, so the rule is one
    * SCAN predicate (`cid < nShards·nCells`), never a per-shard sort, and
    * the DuckDB oracle mirrors it with the same two integers. Each shard
    * ends up with exactly `nCells` centroids (ids are contiguous from 0 —
    * the seededCentroids assumption, ENFORCED by
    * [[requireShardedCentroids]] at every call site: a sparse or
    * non-contiguous corpus would otherwise deal shards uneven or missing
    * centroids and silently degrade recall). centId = the centroid's cid:
    * globally unique, so candidate joins can key on centId alone.
    */
  private def shardedSeededCentroids(c: DataFrame, nShards: Int,
      nCells: Int): DataFrame =
    c.where(col("cid") < nShards.toLong * nCells)
      .select(shardOf(col("cid"), nShards).as("shard"),
        col("cid").as("centId"), col("cid_v").as("cent_v"),
        col("cid_n").as("cent_n"))

  /** Enforce the sharded-quantizer shape instead of assuming it (r18
    * advisor item): every one of `nShards` shards must carry the SAME
    * number of centroids — and exactly `expectCells` when the caller
    * knows it. Used for CALLER-SUPPLIED/trained frames (fixture-sized
    * local relations) and at index-build time; the seeded SERVE path
    * validates with one cheap count() instead (r19 advisor — its frame
    * is a pushed-down corpus scan, and count == nShards·nCells over
    * distinct non-negative ids below that bound already implies the
    * shard-complete even deal). Returns the per-shard cell count — the
    * number [[nprobeForCells]] sizes the per-shard probe from.
    */
  private def requireShardedCentroids(cent: DataFrame, nShards: Int,
      expectCells: Int = -1): Int = {
    val counts = cent.groupBy("shard").count().collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    require(counts.size == nShards,
      s"sharded quantizer must cover all $nShards shards, found " +
        s"${counts.size} (shards ${counts.keys.toSeq.sorted.mkString(",")}) " +
        "— sparse or non-contiguous corpus ids under the seeded rule?")
    require(counts.values.toSet.size == 1,
      s"sharded quantizer dealt UNEVEN per-shard centroid counts " +
        s"(${counts.toSeq.sortBy(_._1).mkString(", ")}) — sparse or " +
        "non-contiguous corpus ids under the seeded rule?")
    val per = counts.values.head
    require(expectCells == -1 || per == expectCells,
      s"sharded quantizer dealt $per centroids per shard, expected " +
        s"$expectCells — sparse or non-contiguous corpus ids under the " +
        "seeded rule? (the round-robin deal assumes ids contiguous from 0)")
    per.toInt
  }

  /** Per-shard Lloyd-trained centroids — the trained-quantizer analogue
    * of [[shardedSeededCentroids]] (r18 verdict item: the sharded path,
    * which exists precisely for the largest corpora, was seeded-only
    * while the unsharded measurements showed trained cells are both the
    * recall ceiling and the cheaper probe). ONE joint job trains all
    * shards — group key (shard, centId), the [[pqTrainedCodebook]]
    * convention — so training cost stays a broadcast-assign pass plus a
    * groupBy per iteration regardless of nShards. Init = each shard's
    * `nCells` smallest-id members (a per-shard row_number window over the
    * tiny candidate set, so sparse/non-contiguous ids train fine; the
    * probe-time validation only binds the SEEDED deal). centId = the
    * init vector's cid — globally unique across shards, the candidate
    * joins' keying assumption. Float means are order-dependent, so
    * trained centroids are for the recall gate / committed fixtures
    * (tools.TrainIvfShardedFixture), not the live hash oracle — the
    * [[kmeansCentroids]] caveat.
    */
  def shardedKmeansCentroids(corpus: DataFrame, nShards: Int = 2,
      nCells: Int = 16, iters: Int = 5, dims: Int = 0): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val c = prep(corpus, "cid")
      .withColumn("shard", shardOf(col("cid"), nShards))
    val d = if (dims > 0) dims
      else corpus.select(size(col("vec"))).head.getInt(0)
    val initW = Window.partitionBy(col("shard")).orderBy(col("cid"))
    var cent = c
      .withColumn("rn", row_number().over(initW))
      .where(col("rn") <= nCells)
      .select(col("shard"), col("cid").as("centId"),
        col("cid_v").as("cent_v"), col("cid_n").as("cent_n"))
      .localCheckpoint(true) // small frame; pin init before iterating
    for (_ <- 1 to iters) {
      // argmax aggregate within OWN shard (the nearestCells keep=1 rule:
      // partial aggregation collapses the |corpus|·nCells scored rows
      // map-side); the winning cell re-joins its vector for the mean
      val assigned = c.join(broadcast(cent), "shard")
        .select(col("cid"), col("shard"), col("centId"),
          (dot_product(col("cid_v"), col("cent_v")) /
            (col("cid_n") * col("cent_n"))).as("csim"))
        .groupBy(col("cid"), col("shard"))
        .agg(max_by(col("centId"),
          struct(col("csim"), (-col("centId")).as("negId"))).as("centId"))
        .join(c.select(col("cid"), col("cid_v")), "cid")
      val updated = assigned.groupBy("shard", "centId")
        .agg(array((0 until d).map(i =>
          avg(element_at(col("cid_v"), i + 1))): _*).as("new_v"))
      // Lloyd edge cases as in kmeansCentroids: empty or zero-mean cells
      // keep their previous centroid
      cent = cent.select(col("shard"), col("centId"), col("cent_v").as("old_v"))
        .join(updated, Seq("shard", "centId"), "left")
        .select(col("shard"), col("centId"),
          when(col("new_v").isNull || norm(col("new_v")) === 0, col("old_v"))
            .otherwise(col("new_v")).as("cent_v"))
        .withColumn("cent_n", norm(col("cent_v")))
        .localCheckpoint(true) // nShards·nCells rows; truncate lineage
    }
    cent
  }

  /** Sharded IVF ANN: hash-partition the corpus into `nShards` shards,
    * build an independent constant-cell IVF index per shard
    * ([[shardedSeededCentroids]]), rank ALL shards' cells together and
    * probe the `nShards·nProbe` globally best per query, and
    * exact-re-rank the candidates to one global top-k.
    *
    * Recall shape (r20 — MEASURED, not assumed): the r18 design probed
    * the top `nProbe` cells in EVERY shard, on the argument that each
    * shard is a uniform 1/nShards sample; RecallX100 refuted it at the
    * 100× decade (equal allocation 0.908/0.853/0.837 at nShards 2/4/8
    * seeded vs 0.976 unsharded; trained x2 0.840 vs 1.000) — a query's
    * neighbor mass is NOT uniform across shards, so the hot shard's
    * per-shard probe list truncates while cold shards burn probes. The
    * fix is two-part (both measured): ONE global probe list of
    * `nShards·nProbe` cells over the union of per-shard quantizers
    * (restores the unsharded router's cell CHOICE — necessary but
    * measured insufficient alone), plus the [[nprobeShardedForCells]]
    * shard-count term (the equal-budget residual is the per-shard
    * ASSIGNMENT restriction; the term's ×2.5/×3/×3.5 at nShards 2/4/8
    * measured seeded 0.987/0.997/≥0.993 vs 0.976 unsharded, trained
    * 0.984 at x2 vs the 1.000 unsharded-trained bar). Cost shape:
    * candidates per query ≈ nShards · nProbe · cellSize =
    * (4+log2 nShards)/2 × the unsharded probed fraction — the explicit
    * price of held recall under sharding; what sharding buys
    * is each shard's centroid table staying under the broadcast ceiling,
    * the assignment scan scoring only |corpus|·perShardCells rows
    * (≈ 1/nShards of the unsharded scan — the measured 354→77→34→22 s
    * cost slide across nShards 1/2/4/8 at the 100× decade), and index
    * builds/rebuilds parallelizing per shard.
    *
    * `nCells`/`nProbe` default to -1 = sized by [[nlistForCorpus]] /
    * [[nprobeShardedForCells]] from the EXPECTED SHARD population
    * `ceil(corpusSize/nShards)` (corpusSize -1 = one count job; pass the
    * known count to avoid it). `centroids` swaps in a trained per-shard
    * quantizer frame (shard, centId, cent_v, cent_n) —
    * [[shardedKmeansCentroids]] or a committed fixture — without touching
    * the assignment/probe/re-rank plumbing; the per-shard cell count
    * (and the probe policy) then derive from the FRAME, and every
    * quantizer is validated shard-complete/even before use: supplied
    * frames through the full [[requireShardedCentroids]] check, the
    * seeded deal through one count() over its pushed-down scan (r19
    * advisor — count == nShards·nCells over distinct non-negative ids
    * below that bound implies exactly ids 0..bound-1). A contiguous
    * corpus SMALLER than the rule's deal clamps nCells to n/nShards —
    * the smaller quantizer, not a misleading raise.
    */
  def ivfShardedTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      nShards: Int = 2,
      nCells: Int = -1,
      nProbe: Int = -1,
      corpusSize: Long = -1L,
      centroids: Option[DataFrame] = None, // (shard, centId, cent_v, cent_n)
  ): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val c = prep(corpus, "cid")
    val seededCells = if (centroids.isDefined) -1 else {
      val n = if (corpusSize >= 0) corpusSize else corpus.count()
      require(n >= nShards,
        s"corpus ($n rows) cannot seed one centroid per shard (nShards=$nShards)")
      val perShard = (n - 1) / nShards + 1
      val want = if (nCells != -1) nCells else nlistForCorpus(perShard)
      // corpus smaller than the quantizer the rule would deal (r19
      // advisor): the seeded deal draws ids < nShards·nCells, so a
      // CONTIGUOUS corpus with n < nShards·nCells would under-deal some
      // shards and trip the shape validation with a misleading
      // "non-contiguous ids" error. Clamp to what the id range can
      // supply — the smaller quantizer the pre-validation path served.
      math.min(want.toLong, n / nShards).toInt
    }
    val cent = centroids.getOrElse(shardedSeededCentroids(c, nShards, seededCells))
    val nc =
      if (centroids.isDefined) requireShardedCentroids(cent, nShards)
      else {
        // Seeded path (r19 advisor): the frame is a pushed-down
        // `cid < nShards·seededCells` scan over the CORPUS, not a local
        // relation — the full per-shard groupBy/collect weakened the
        // documented "pass the known count to avoid a job" contract.
        // Distinct non-negative ids below the bound count to
        // nShards·seededCells ONLY when they are exactly 0..bound-1,
        // i.e. the round-robin deal is shard-complete AND even — one
        // count() over the tiny filtered scan pins the whole shape.
        val bound = nShards.toLong * seededCells
        val got = cent.count()
        require(got == bound,
          s"seeded sharded quantizer found $got corpus ids below $bound, " +
            s"expected $bound — sparse or non-contiguous corpus ids " +
            "(the round-robin deal assumes ids contiguous from 0)")
        seededCells
      }
    val np = if (nProbe != -1) nProbe else nprobeShardedForCells(nc, nShards)
    // corpus side: argmax within OWN shard (equi-join on shard keeps the
    // scored population at |corpus|·nCells, same as unsharded)
    val assigned = c.withColumn("shard", shardOf(col("cid"), nShards))
      .join(broadcast(cent), "shard")
      .select(col("cid"),
        col("centId"),
        (dot_product(col("cid_v"), col("cent_v")) /
          (col("cid_n") * col("cent_n"))).as("csim"))
      .groupBy(col("cid"))
      .agg(max_by(col("centId"),
        struct(col("csim"), (-col("centId")).as("negId"))).as("centId"))
    // query side: ONE GLOBAL probe list of nShards·nProbe cells over the
    // union of per-shard quantizers (r20 — the measured fix: equal
    // per-shard allocation `PARTITION BY (qid, shard) … rn <= nProbe`
    // sat 0.07–0.16 recall below the unsharded router at the 100×
    // decade, because a query's neighbor mass is NOT uniform across
    // shards and the hot shard's probe list truncates while cold shards
    // burn probes; ranking all shards' cells together restores the
    // unsharded router's cell choice at the IDENTICAL candidate budget)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("centId"))
    val probed = prep(queries, "qid").crossJoin(broadcast(cent))
      .select(col("qid"), col("centId"),
        (dot_product(col("qid_v"), col("cent_v")) /
          (col("qid_n") * col("cent_n"))).as("csim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nShards.toLong * np)
      .select(col("qid"), col("centId"))
    // centIds are globally unique, keep=1 assignment + distinct probed
    // cells → pairs already unique (the ivfPqTopK argument)
    val cand = probed.join(assigned, "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    rescoreTopK(cand, queries, corpus, k) // global exact re-rank
  }

  /** Persist a SHARDED IVF index: cells laid out `shard=…/centId=…` (two
    * partition levels — a probe prunes to probed (shard, cell) directory
    * pairs), the shard-keyed centroid table, and a one-row meta stamping
    * (nShards, perShardCells, corpusCount) — the stamp conventions of
    * [[writeSq8Index]]/[[writeProjectedIndex]]: a server sizes its probe
    * policy from the INDEX, never from jobs over the store.
    */
  def writeIvfIndexSharded(corpus: DataFrame, path: String,
      nShards: Int = 2, nCells: Int = -1,
      centroids: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = prep(corpus, "cid")
    val n = corpus.count()
    val seededCells = if (centroids.isDefined) -1 else {
      require(n >= nShards,
        s"corpus ($n rows) cannot seed one centroid per shard (nShards=$nShards)")
      val perShard = (n - 1) / nShards + 1
      val want = if (nCells != -1) nCells else nlistForCorpus(perShard)
      // same small-corpus clamp as ivfShardedTopK (r19 advisor)
      math.min(want.toLong, n / nShards).toInt
    }
    val cent = centroids.getOrElse(shardedSeededCentroids(c, nShards, seededCells))
    val nc = requireShardedCentroids(cent, nShards, expectCells = seededCells)
    val assigned = c.withColumn("shard", shardOf(col("cid"), nShards))
      .join(broadcast(cent), "shard")
      .select(col("cid"), col("shard"), col("centId"),
        (dot_product(col("cid_v"), col("cent_v")) /
          (col("cid_n") * col("cent_n"))).as("csim"))
      .groupBy(col("cid"), col("shard"))
      .agg(max_by(col("centId"),
        struct(col("csim"), (-col("centId")).as("negId"))).as("centId"))
    corpus.join(assigned, "cid")
      .write.partitionBy("shard", "centId").parquet(s"$path/cells")
    // stamp the probe-policy integers into the centroid table's schema
    // metadata too (the writeSq8Index convention): the serve sizes its
    // probe with a schema read instead of a one-row meta job (r21). The
    // meta dataset still persists — it is the layout's documented
    // presence marker (serve raises without it) and the fallback for
    // readers of pre-r21 indexes.
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.nShards", nShards.toLong)
      .putLong("graft.perShardCells", nc.toLong)
      .putLong("graft.corpusCount", n).build()
    cent.select(col("shard"), col("centId").as("centId", stamp),
        col("cent_v"), col("cent_n"))
      .write.parquet(s"$path/centroids")
    Seq((nShards, nc, n)).toDF("nShards", "perShardCells", "corpusCount")
      .coalesce(1).write.parquet(s"$path/meta")
  }

  /** Query a [[writeIvfIndexSharded]] layout: rank ALL shards' persisted
    * centroids together and probe the `nShards·nProbe` globally best
    * cells (the r20 router — see [[ivfShardedTopK]]), read ONLY the
    * probed (shard, centId) directories, globally exact-re-rank.
    * `nProbe = -1` applies [[nprobeShardedForCells]] (the base policy ×
    * the measured shard-count term) to the PER-SHARD cell count and
    * nShards stamped at build time; an index without the meta stamp
    * RAISES (the projected-index rule: guessing a probe policy silently
    * serves wrong recall).
    */
  def ivfTopKIndexedSharded(queries: DataFrame, path: String,
      k: Int = 10, nProbe: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"sharded IVF index at $path has no meta stamp — rebuild with writeIvfIndexSharded")
    val cent = spark.read.parquet(s"$path/centroids")
    // probe-policy integers from the centroid schema stamp — zero jobs
    // (r21); a pre-r21 index falls back to the one-row meta read
    val md = cent.schema("centId").metadata
    val (perShardCells, nShards) =
      if (md.contains("graft.perShardCells"))
        (md.getLong("graft.perShardCells").toInt,
          md.getLong("graft.nShards").toInt)
      else {
        val meta = spark.read.parquet(s"$path/meta")
          .select(col("perShardCells").cast("int"), col("nShards").cast("int"))
          .head()
        (meta.getInt(0), meta.getInt(1))
      }
    val np =
      if (nProbe != -1) nProbe
      else nprobeShardedForCells(perShardCells, nShards)
    // global allocation over the union of per-shard cells — must match
    // ivfShardedTopK's router exactly (r20; see the rationale there)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("centId"))
    val probed = prep(queries, "qid").crossJoin(broadcast(cent))
      .select(col("qid"), col("shard"), col("centId"),
        (dot_product(col("qid_v"), col("cent_v")) /
          (col("qid_n") * col("cent_n"))).as("csim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nShards.toLong * np)
      .select(col("qid"), col("shard"), col("centId"))
    val cells = spark.read.parquet(s"$path/cells")
    // restrict once to the union of probed (shard, cell) directories —
    // the one store read: candidates carry `vec` straight from this scan
    // into the rescore, and keep=1 per-shard assignment + the distinct
    // probe window make (qid, cid) pairs unique without a distinct()
    // (the ivfTopKIndexed shape, r21)
    val probedCells = cells.join(
      broadcast(probed.select("shard", "centId").distinct()),
      Seq("shard", "centId"))
    val cand = probedCells.join(probed, Seq("shard", "centId"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("vec"))
    rescoreTopKWithVec(cand, queries, k)
  }

  /** Product-quantization (PQ/ADC) ANN: compress each corpus vector to `m`
    * one-byte codes — per subspace, the id of its nearest codebook
    * centroid — then rank candidates by the asymmetric-distance sum of
    * per-subspace query·centroid dots and exact-rescore only the top
    * `refine`. THE memory lever at 100 TB: a 64-dim float vector (256 B)
    * becomes `m` bytes (32× smaller), so the candidate scan touches codes,
    * not vectors, and the shuffle carries (id, subspace, code) ints only.
    *
    * Like [[ivfTopK]], the codebook is SEEDED (centroids = sub-vectors of
    * the `kCode` smallest-id corpus vectors): deterministic, so the DuckDB
    * oracle recomputes encode + ADC + refine exactly. A k-means-trained
    * codebook swaps in by replacing the `cbSub` frame only.
    *
    * ADC sums are decimal-accumulated over per-subspace dots rounded to 9
    * decimals — bit-reproducible across engines, so the refine cutoff can
    * never drift from the oracle.
    */
  /** Per-subspace k-means codebooks for [[pqTopK]] — one joint job trains
    * all `m` codebooks (group key = (s, codeId)), seeded from the
    * deterministic codebook so iters = 0 reproduces the oracle-gated
    * variant. Same Lloyd edge-case handling as [[kmeansCentroids]]; same
    * caveat: float means are order-dependent, so trained codebooks are for
    * the recall unit gate, not the hash oracle.
    */
  def pqTrainedCodebook(corpus: DataFrame, m: Int = 8, subDim: Int = 8,
      kCode: Int = 16, iters: Int = 5): DataFrame = {
    val c = prep(corpus, "cid")
    def subSlices(v: Column) =
      array((0 until m).map(s => slice(v, s * subDim + 1, subDim)): _*)
    val cSub = c.select(col("cid"), posexplode(subSlices(col("cid_v"))))
      .withColumnsRenamed(Map("pos" -> "s", "col" -> "c_sub"))
    var cb = c.where(col("cid") < kCode)
      .select(col("cid").cast("int").as("codeId"), posexplode(subSlices(col("cid_v"))))
      .withColumnsRenamed(Map("pos" -> "s", "col" -> "cb_sub"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("cid", "s").orderBy(col("d2").asc, col("codeId"))
      val assigned = cSub.join(broadcast(cb), "s")
        .select(col("cid"), col("s"), col("codeId"), col("c_sub"),
          (dot_product(col("c_sub"), col("c_sub"))
            - lit(2.0) * dot_product(col("c_sub"), col("cb_sub"))
            + dot_product(col("cb_sub"), col("cb_sub"))).as("d2"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      val updated = assigned.groupBy("s", "codeId")
        .agg(array((0 until subDim).map(i =>
          avg(element_at(col("c_sub"), i + 1))): _*).as("new_sub"))
      cb = cb.withColumnRenamed("cb_sub", "old_sub")
        .join(updated, Seq("s", "codeId"), "left")
        .select(col("s"), col("codeId"),
          coalesce(col("new_sub"), col("old_sub")).as("cb_sub"))
        .localCheckpoint(true) // m×kCode rows; truncate per-iteration lineage
    }
    cb
  }

  /** The ANN family's no-drift ranking value on the int64 fast path: the
    * UNSCALED DECIMAL(38,12) rendering of a 9-dp-rounded double
    * (functions.DecimalSumOps.dec_unscaled). Ranking on this long IS
    * ranking on the old `cast(DECIMAL(38,12))` column — one scale, so
    * unscaled order = decimal order, strictly — but the refine window
    * sorts/compares codegen longs instead of Decimal objects, and ADC
    * sums accumulate as plain longs (sum of unscaleds at one scale = the
    * unscaled of the decimal sum). The value never escapes: every tier
    * exact-rescores the survivors, so outputs and the DuckDB oracles are
    * untouched. Domain: |x| < 9.2·10⁶ per ranked value (longValueExact
    * raises past it) and ANSI long-sum overflow raises on pathological
    * magnitudes — loud, never silently wrong.
    */
  private def adotLong(c: Column): Column =
    graft.functions.DecimalSumOps.dec_unscaled(c, 12)

  private def subSlices(v: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(s => slice(v, s * subDim + 1, subDim)): _*)

  /** Seeded per-subspace codebook: sub-vectors of the `kCode` smallest-id
    * corpus vectors (prepped frame in) — (s, codeId, cb_sub). Deterministic
    * → oracle-expressible; [[pqTrainedCodebook]] swaps in frame-for-frame.
    */
  private def seededCodebook(c: DataFrame, m: Int, subDim: Int, kCode: Int): DataFrame =
    c.where(col("cid") < kCode)
      .select(col("cid").cast("int").as("codeId"), posexplode(subSlices(col("cid_v"), m, subDim)))
      .withColumnsRenamed(Map("pos" -> "s", "col" -> "cb_sub"))

  /** PQ encode: per (cid, s) the L2-nearest codebook centroid (ties →
    * smallest id) — the m-byte compressed corpus, (cid, s, codeId).
    * Argmin AGGREGATE, not a row_number window (the nearestCells keep=1
    * rule): the corpus side scores m·kCode rows per vector, and partial
    * aggregation collapses them map-side before any exchange.
    *
    * The ranking value is the REDUCED distance `|cb|² − 2·c·cb`: at a
    * fixed (cid, s) the full ‖c − cb‖² differs from it by the constant
    * |c|², so the argmin is the same quantizer — but the hot join row
    * computes ONE subspace dot instead of three (|cb|² is precomputed
    * once on the m·kCode-row broadcast side). This matters since
    * [[kCodeForCorpus]]: the encode scan is corpus·m·kCode rows, the one
    * stage that grows with the codebook (r18 RecallX100 measured the
    * 3-dot form at 77 s for a 20k corpus at kCode 160). The DuckDB
    * oracles rank on the SAME reduced expression — constant-shifted
    * doubles can collapse float ties differently than the full form, so
    * the two engines must share one formula, not two algebraically-equal
    * ones.
    */
  private def pqEncode(c: DataFrame, cbSub: DataFrame, m: Int, subDim: Int): DataFrame = {
    val cSub = c.select(col("cid"), posexplode(subSlices(col("cid_v"), m, subDim)))
      .withColumnsRenamed(Map("pos" -> "s", "col" -> "c_sub"))
    val cb = cbSub.withColumn("cbn", dot_product(col("cb_sub"), col("cb_sub")))
    cSub.join(broadcast(cb), "s")
      .select(col("cid"), col("s"), col("codeId"),
        (col("cbn") - lit(2.0) * dot_product(col("c_sub"), col("cb_sub"))).as("d2"))
      .groupBy(col("cid"), col("s"))
      .agg(min_by(col("codeId"), struct(col("d2"), col("codeId"))).as("codeId"))
      .select("cid", "s", "codeId")
  }

  /** ADC lookup table: per (qid, s, codeId) the query-subvector · centroid
    * dot, rounded to 9 decimals and decimal-typed so ADC sums are
    * bit-reproducible across engines (the refine cutoff can never drift
    * from the oracle).
    */
  private def pqQueryTable(q: DataFrame, cbSub: DataFrame, m: Int, subDim: Int): DataFrame =
    q.select(col("qid"), posexplode(subSlices(col("qid_v"), m, subDim)))
      .withColumnsRenamed(Map("pos" -> "s", "col" -> "q_sub"))
      .join(broadcast(cbSub), "s")
      .select(col("qid"), col("s"), col("codeId"),
        adotLong(round(dot_product(col("q_sub"), col("cb_sub")), 9)).as("pdot"))

  /** ADC-rank candidate pairs and exact-rescore the per-query top `refine`.
    * `pairs` bounds which (qid, cid) combinations are scored: pqTopK passes
    * None (exhaustive — every query × every code), ivfPqTopK passes the
    * IVF-routed subset so the scan never touches unprobed cells.
    */
  private def adcRefineRescore(pairs: Option[DataFrame], qTab: DataFrame,
      codes: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int, refine: Int): DataFrame = {
    val approx = (pairs match {
      case Some(p) => p.join(codes, "cid").join(qTab, Seq("qid", "s", "codeId"))
      case None => qTab.join(codes, Seq("s", "codeId"))
        .where(col("qid") =!= col("cid"))
    }).groupBy("qid", "cid").agg(sum(col("pdot")).as("adot"))
    val cand = approx
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adot").desc, col("cid"))))
      .where(col("arn") <= refine).select("qid", "cid")
    rescoreTopK(cand, queries, corpus, k) // exact rescore of refined candidates only
  }

  def pqTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      m: Int = 8,         // subspaces
      subDim: Int = 8,    // dims per subspace
      kCode: Int = 16,    // centroids per subspace codebook
      refine: Int = 30,   // exact-rescore budget per query
      codebook: Option[DataFrame] = None, // (s, codeId, cb_sub); e.g. pqTrainedCodebook
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val q = prep(queries, "qid")
    val cbSub = codebook.getOrElse(seededCodebook(c, m, subDim, kCode))
    val codes = pqEncode(c, cbSub, m, subDim)
    val qTab = pqQueryTable(q, cbSub, m, subDim)
    // COMPRESSION-ONLY variant: the ADC join touches every (query, corpus)
    // pair — memory shrinks 32×, scan work does not. The scan-pruning form
    // is [[ivfPqTopK]]; keep this one for corpora small enough to ADC-scan.
    adcRefineRescore(None, qTab, codes, queries, corpus, k, refine)
  }

  /** Persist a plain-PQ index — the build-offline/serve-online split of
    * [[pqTopK]] (r19: the kCode-amortization item). Since
    * [[kCodeForCorpus]] the ENCODE pass (corpus·m·kCode candidate rows,
    * the one stage that grows with the codebook) dominates the in-flight
    * form's cost — r18 measured the in-flight rows at 3.5× their own
    * served twins at one decade up — and encode output is a pure
    * function of (corpus, codebook), i.e. BUILD state, not query state.
    * This layout pays it once: codes, full-precision vectors (for the
    * exact rescore), the codebook, and the (corpusCount, m, subDim)
    * stamp, so serving never encodes and never runs sizing jobs over the
    * store. Defaults are the seeded codebook sized by [[kCodeForCorpus]];
    * pass [[pqTrainedCodebook]]'s frame for the production build.
    */
  def writePqIndex(corpus: DataFrame, path: String,
      m: Int = 8, subDim: Int = 8,
      codebook: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = prep(corpus, "cid")
    val n = corpus.count()
    val cbSub = codebook.getOrElse(seededCodebook(c, m, subDim, kCodeForCorpus(n)))
    pqEncode(c, cbSub, m, subDim).write.parquet(s"$path/codes")
    corpus.select(col("cid"), col("vec")).write.parquet(s"$path/vectors")
    // schema-metadata stamp on the codebook (the writeSq8Index
    // convention): the serve reads its sizing integers with a schema
    // read instead of a one-row meta job (r21); the meta dataset stays
    // as the presence marker + pre-r21 fallback
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.corpusCount", n)
      .putLong("graft.m", m.toLong)
      .putLong("graft.subDim", subDim.toLong).build()
    cbSub.select(col("s"), col("codeId").as("codeId", stamp), col("cb_sub"))
      .write.parquet(s"$path/codebook")
    Seq((n, m, subDim)).toDF("corpusCount", "m", "subDim")
      .coalesce(1).write.parquet(s"$path/meta")
  }

  /** Query a [[writePqIndex]] layout: ADC-rank the PERSISTED codes against
    * the per-query lookup table (exhaustive pairs — the [[pqTopK]] shape;
    * the scan touches m-byte codes, never vectors), exact-rescore refine
    * survivors against the persisted vectors. Encode is deterministic
    * given the persisted codebook, so results equal [[pqTopK]] with the
    * same frames and the same DuckDB oracle gates both. `refine = -1`
    * sizes the budget with [[refineForCandidates]] from the STAMPED
    * corpus count (the ranked pool here IS the corpus — the exhaustive
    * tier's rule); an index without the meta stamp RAISES.
    */
  def pqTopKIndexed(queries: DataFrame, path: String,
      k: Int = 10, refine: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"PQ index at $path has no meta stamp — rebuild with writePqIndex")
    val codes = spark.read.parquet(s"$path/codes")
    val vectors = spark.read.parquet(s"$path/vectors")
    val cbSub = spark.read.parquet(s"$path/codebook")
    // sizing integers from the codebook schema stamp — zero jobs (r21);
    // a pre-r21 index falls back to the one-row meta read
    val cmd = cbSub.schema("codeId").metadata
    val (n, m, subDim) =
      if (cmd.contains("graft.corpusCount"))
        (cmd.getLong("graft.corpusCount"), cmd.getLong("graft.m").toInt,
          cmd.getLong("graft.subDim").toInt)
      else {
        val meta = spark.read.parquet(s"$path/meta")
          .select(col("corpusCount").cast("long"), col("m").cast("int"),
            col("subDim").cast("int")).head()
        (meta.getLong(0), meta.getInt(1), meta.getInt(2))
      }
    val rf = if (refine != -1) refine else refineForCandidates(n)
    val qTab = pqQueryTable(prep(queries, "qid"), cbSub, m, subDim)
    adcRefineRescore(None, qTab, codes,
      queries, vectors.select(col("cid"), col("vec")), k, rf)
  }

  /** IVF-PQ: the coarse quantizer routes, PQ compresses, ADC ranks, exact
    * rescore finishes — the standard composition that makes PQ a real
    * 100 TB operator. Per query only the `nProbe` nearest of `nCells` cells
    * are ADC-scanned, so (unlike [[pqTopK]]) the ADC join's corpus side is
    * the probed subset (~nProbe/nCells of the codes), the per-query ranking
    * window is bounded by the probed-cell population, and every shuffle
    * still carries (id, subspace, code) ints only.
    *
    * Both quantizers are SEEDED by default (coarse cells = `nCells`
    * smallest-id vectors, codebook = sub-vectors of the `kCode` smallest) —
    * deterministic, so the DuckDB oracle mirrors routing + encode + ADC +
    * refine exactly; trained frames ([[kmeansCentroids]],
    * [[pqTrainedCodebook]]) swap in without touching the plumbing.
    *
    * Non-residual form (codes quantize raw vectors, not vector − centroid):
    * one codebook serves all cells, so routing changes WHICH codes are
    * scanned, never the codes themselves — ADC values match [[pqTopK]]'s
    * for the pairs both scan.
    */
  def ivfPqTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      nCells: Int = 16,   // coarse cells
      nProbe: Int = 4,    // cells ADC-scanned per query
      m: Int = 8,         // subspaces
      subDim: Int = 8,    // dims per subspace
      kCode: Int = 16,    // centroids per subspace codebook
      refine: Int = 30,   // exact-rescore budget per query
      centroids: Option[DataFrame] = None, // (centId, cent_v, cent_n)
      codebook: Option[DataFrame] = None,  // (s, codeId, cb_sub)
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val q = prep(queries, "qid")
    val cent = centroids.getOrElse(seededCentroids(c, nCells))
    // routing: (qid, cid) pairs inside probed cells only. keep=1 assignment
    // means a cid lives in exactly one cell and a qid probes nProbe distinct
    // cells, so pairs are already unique — no distinct() shuffle needed.
    val assigned = nearestCells(c, "cid", cent, keep = 1)
    val probed = nearestCells(q, "qid", cent, keep = nProbe)
    val routed = probed.join(assigned, "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    val cbSub = codebook.getOrElse(seededCodebook(c, m, subDim, kCode))
    val codes = pqEncode(c, cbSub, m, subDim)
    val qTab = pqQueryTable(q, cbSub, m, subDim)
    adcRefineRescore(Some(routed), qTab, codes, queries, corpus, k, refine)
  }

  /** Persist an IVF-PQ index — the build-offline/serve-online split of
    * [[ivfPqTopK]], the tier where it matters most at 100 TB: what
    * serving SCANS for ranking is the code table, `m` small ints per
    * vector laid out `centId=…` (one directory per coarse cell), so an
    * nProbe/nCells probe reads nProbe/nCells of a 32×-compressed store;
    * full-precision vectors (also cell-partitioned) are touched only for
    * refine survivors. The centroid and codebook tables persist alongside
    * — ROUTING STATE IS INDEX STATE: a serve that re-derived cells or
    * codes from seeds against a drifted corpus would rank in a different
    * quantization than the codes were written in, a silent-recall bug, so
    * [[ivfPqTopKIndexed]] reads everything (plus the corpus count its
    * refine budget needs) from the stamp and never runs sizing jobs over
    * the store.
    *
    * Pass trained frames ([[kmeansCentroids]], [[pqTrainedCodebook]]) for
    * the production build; defaults are the seeded quantizers sized by
    * [[nlistForCorpus]]/[[kCodeForCorpus]].
    */
  def writeIvfPqIndex(corpus: DataFrame, path: String,
      m: Int = 8, subDim: Int = 8,
      centroids: Option[DataFrame] = None,
      codebook: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = prep(corpus, "cid")
    val n = corpus.count()
    val cent = centroids.getOrElse(seededCentroids(c, nlistForCorpus(n)))
    val nlist = cent.count().toInt
    val cbSub = codebook.getOrElse(seededCodebook(c, m, subDim, kCode = kCodeForCorpus(n)))
    val assigned = nearestCells(c, "cid", cent, keep = 1)
    pqEncode(c, cbSub, m, subDim).join(assigned, "cid")
      .write.partitionBy("centId").parquet(s"$path/codes")
    corpus.join(assigned, "cid")
      .write.partitionBy("centId").parquet(s"$path/vectors")
    // schema-metadata stamp on the centroid table (the writeSq8Index
    // convention) so the serve sizes nprobe + refine with a schema read
    // instead of a one-row meta job (r21); meta stays as the presence
    // marker + pre-r21 fallback
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.corpusCount", n)
      .putLong("graft.m", m.toLong)
      .putLong("graft.subDim", subDim.toLong)
      .putLong("graft.nlist", nlist.toLong).build()
    cent.select(col("centId").as("centId", stamp), col("cent_v"),
        col("cent_n"))
      .write.parquet(s"$path/centroids")
    cbSub.write.parquet(s"$path/codebook")
    Seq((n, m, subDim, nlist)).toDF("corpusCount", "m", "subDim", "nlist")
      .coalesce(1).write.parquet(s"$path/meta")
  }

  /** Query a [[writeIvfPqIndex]] layout: route against the persisted
    * centroids, ADC-rank the persisted codes of probed cells only (the
    * code and vector reads prune to probed `centId=` directories),
    * exact-rescore refine survivors against the persisted vectors.
    * Encode/routing are deterministic given the persisted quantizers, so
    * results equal [[ivfPqTopK]] with the same frames and the same DuckDB
    * oracle gates both.
    *
    * `nProbe = -1` sizes from the stamped nlist ([[nprobeForCells]]);
    * `refine = -1` sizes from the stamped corpus count via
    * [[expectedProbed]] + [[refineForCandidates]] — both reads of the
    * one-row meta, zero jobs over the store. An index without the meta
    * stamp RAISES.
    */
  def ivfPqTopKIndexed(queries: DataFrame, path: String,
      k: Int = 10, nProbe: Int = -1, refine: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"IVF-PQ index at $path has no meta stamp — rebuild with writeIvfPqIndex")
    val cent = spark.read.parquet(s"$path/centroids")
    // sizing integers from the centroid schema stamp — zero jobs (r21);
    // a pre-r21 index falls back to the one-row meta read
    val cmd = cent.schema("centId").metadata
    val (n, m, subDim, nlist) =
      if (cmd.contains("graft.corpusCount"))
        (cmd.getLong("graft.corpusCount"), cmd.getLong("graft.m").toInt,
          cmd.getLong("graft.subDim").toInt, cmd.getLong("graft.nlist").toInt)
      else {
        val meta = spark.read.parquet(s"$path/meta")
          .select(col("corpusCount").cast("long"), col("m").cast("int"),
            col("subDim").cast("int"), col("nlist").cast("int")).head()
        (meta.getLong(0), meta.getInt(1), meta.getInt(2), meta.getInt(3))
      }
    val np = if (nProbe != -1) nProbe else nprobeForCells(nlist)
    val rf = if (refine != -1) refine
      else refineForCandidates(expectedProbed(n, nlist, np))
    val cbSub = spark.read.parquet(s"$path/codebook")
    val q = prep(queries, "qid")
    val probed = nearestCells(q, "qid", cent, keep = np)
    val probedCells = broadcast(probed.select("centId").distinct())
    // both data-sized reads prune to probed cell directories
    val codes = spark.read.parquet(s"$path/codes").join(probedCells, "centId")
    val vectors = spark.read.parquet(s"$path/vectors").join(probedCells, "centId")
    // route against the VECTORS table's (cid, centId) projection — one
    // row per cid by construction, so no distinct() exchange; the former
    // shape distinct()-ed the codes table's m rows per cid (r21)
    val routed = probed
      .join(vectors.select("cid", "centId"), "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    val qTab = pqQueryTable(q, cbSub, m, subDim)
    adcRefineRescore(Some(routed), qTab, codes.select("cid", "s", "codeId"),
      queries, vectors.select(col("cid"), col("vec")), k, rf)
  }

  /** Per-row residuals against the assigned coarse cell: (cid, centId,
    * r_v = vec − cell centroid). One broadcast-centroid pass; the only
    * shuffle is the id-keyed self-join re-attaching vectors to their
    * assignment.
    */
  private def residualFrame(c: DataFrame, cent: DataFrame): DataFrame =
    nearestCells(c, "cid", cent, keep = 1)
      .join(broadcast(cent.select(col("centId"), col("cent_v"))), "centId")
      .join(c.select(col("cid"), col("cid_v")), "cid")
      .select(col("cid"), col("centId"),
        zip_with(col("cid_v"), col("cent_v"), (x, m) => x - m).as("r_v"))

  /** Train a per-subspace codebook on RESIDUALS (vec − assigned-cell
    * centroid) — the standard IVFADC preparation (Jegou et al. 2011,
    * §III): residuals concentrate near the origin, so `kCode` centroids
    * cover them far more faithfully than they cover raw vectors, which is
    * where residual IVF-PQ's recall edge comes from. Same Lloyd kernel as
    * [[pqTrainedCodebook]]; float-order dependent, so commit the result
    * as a fixture (tools.TrainPqResidualFixture) and gate the SERVE path.
    */
  def pqResidualCodebook(corpus: DataFrame, centroids: DataFrame,
      m: Int = 8, subDim: Int = 8, kCode: Int = 16, iters: Int = 5): DataFrame =
    pqTrainedCodebook(
      residualFrame(prep(corpus, "cid"), centroids)
        .select(col("cid"), col("r_v").as("vec")),
      m, subDim, kCode, iters)

  /** RESIDUAL IVF-PQ (IVFADC, Jegou et al. 2011): the coarse quantizer
    * routes, PQ codes quantize the RESIDUAL vec − centroid, and ADC
    * exploits dot(q, centroid + Σ_s cb_s) = dot(q, centroid) + Σ_s
    * dot(q_sub, cb_s) — one broadcast qcent term per (query, cell) plus
    * the same per-subspace lookup table as the non-residual form. At
    * equal bits the codebook spans the residual cloud instead of the
    * whole corpus spread, so ranking is finer and recall ≥ the
    * non-residual [[ivfPqTopK]] (pinned by OpsSpec on the fixture).
    *
    * Scale shape: identical to [[ivfPqTopK]] — centroids and codebooks
    * broadcast, every shuffle carries (id, subspace, code) ints only, the
    * ADC scan touches probed cells only, refine survivors join vectors
    * back by id.
    */
  def ivfPqResidualTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      subDim: Int = 8,
      kCode: Int = 16,
      refine: Int = 30,
      centroids: Option[DataFrame] = None, // (centId, cent_v, cent_n)
      codebook: Option[DataFrame] = None,  // RESIDUAL (s, codeId, cb_sub)
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val q = prep(queries, "qid")
    val cent = centroids.getOrElse(seededCentroids(c, nCells))
    val res = residualFrame(c, cent) // (cid, centId, r_v)
    val resAsC = res.select(col("cid"), col("r_v").as("cid_v"))
    val cbSub = codebook.getOrElse(seededCodebook(resAsC, m, subDim, kCode))
    val codes = pqEncode(resAsC, cbSub, m, subDim)
    val probed = nearestCells(q, "qid", cent, keep = nProbe)
    val routed = probed.join(res.select("cid", "centId"), "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid", "centId")
    val qTab = pqQueryTable(q, cbSub, m, subDim)
    val qcent = q.select(col("qid"), col("qid_v"))
      .crossJoin(broadcast(cent))
      .select(col("qid"), col("centId"),
        adotLong(round(dot_product(col("qid_v"), col("cent_v")), 9)).as("qcdot"))
    val approx = routed.join(codes, "cid").join(qTab, Seq("qid", "s", "codeId"))
      .groupBy("qid", "cid", "centId").agg(sum(col("pdot")).as("rdot"))
      .join(qcent, Seq("qid", "centId"))
      .select(col("qid"), col("cid"), (col("rdot") + col("qcdot")).as("adot"))
    val cand = approx
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adot").desc, col("cid"))))
      .where(col("arn") <= refine).select("qid", "cid")
    rescoreTopK(cand, queries, corpus, k)
  }

  /** Scalar-quantization (SQ8) ANN: compress each corpus dimension to ONE
    * byte — code = ⌊(x − lo_d) / step_d⌋ clamped to [0, 255], with
    * per-dimension ranges [lo_d, hi_d) from one corpus aggregate and
    * step_d = (hi_d − lo_d)/256 — then rank candidates by the exact dot
    * against the BUCKET-MIDPOINT reconstruction (lo_d + (code+0.5)·step_d,
    * the asymmetric-distance convention: the query stays full-precision)
    * and exact-rescore the top `refine`. The compression tier between raw
    * floats and PQ: 4× (float32→byte) with near-exact ranking — each
    * dimension keeps 256 levels where PQ's 16-centroid codebook keeps 16
    * levels per 8-dim SUBSPACE — so SQ8 needs a far smaller refine budget
    * for the same recall (FAISS's SQ8 vs PQ trade).
    *
    * Deterministic end-to-end (min/max are order-independent, floor and
    * the midpoint decode are exact double arithmetic), so the DuckDB
    * oracle recomputes ranges → codes → reconstruction → refine
    * bit-for-bit; the approximate dot rounds to 9 decimals and ranks as
    * DECIMAL so the refine cutoff can never drift between engines.
    *
    * Like [[pqTopK]] this is the COMPRESSION-ONLY variant: the ranking
    * scan touches every (query, corpus) pair — memory shrinks 4×, scan
    * work does not (the decode is once per corpus ROW, not per pair, and
    * the per-pair op is one codegen dot). Routing composes exactly as in
    * [[ivfPqTopK]]: restrict the cross join to IVF-probed cells and
    * nothing else changes.
    */
  def sq8TopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      refine: Int = 30,   // exact-rescore budget per query
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val rec = sq8Reconstructed(c, corpus)
    val approx = prep(queries, "qid").select(col("qid"), col("qid_v"))
      .crossJoin(rec)
      .where(col("qid") =!= col("cid"))
    sq8RefineRescore(approx, queries, corpus, k, refine)
  }

  /** IVF-SQ8: coarse cells route, SQ8 codes compress, the midpoint-decode
    * dot ranks ONLY inside probed cells, exact rescore finishes — the
    * scan-pruning form of [[sq8TopK]], exactly the [[ivfPqTopK]]
    * composition one compression tier up. Non-residual (ranges come from
    * the WHOLE corpus, not per cell), so routing changes WHICH codes are
    * scanned, never the codes themselves — ranking dots match
    * [[sq8TopK]]'s for the pairs both scan, and probing every cell
    * reproduces it exactly (pinned in OpsSpec).
    */
  def ivfSq8TopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      nCells: Int = 16,   // coarse cells
      nProbe: Int = 4,    // cells scanned per query
      refine: Int = 30,   // exact-rescore budget per query
      centroids: Option[DataFrame] = None, // (centId, cent_v, cent_n)
  ): DataFrame = {
    val c = prep(corpus, "cid")
    val q = prep(queries, "qid")
    val cent = centroids.getOrElse(seededCentroids(c, nCells))
    // routing: keep=1 assignment + nProbe distinct probed cells per query
    // means routed pairs are already unique (the ivfPqTopK argument)
    val assigned = nearestCells(c, "cid", cent, keep = 1)
    val probed = nearestCells(q, "qid", cent, keep = nProbe)
    val routed = probed.join(assigned, "centId")
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    val approx = routed
      .join(sq8Reconstructed(c, corpus), "cid")
      .join(q.select(col("qid"), col("qid_v")), "qid")
    sq8RefineRescore(approx, queries, corpus, k, refine)
  }

  /** The SQ8 build: per-dimension ranges → byte codes → bucket-midpoint
    * reconstruction, one row per corpus vector — `(cid, rv)`. ONE
    * definition shared by the exhaustive and IVF-routed forms, so their
    * ranking dots agree bit-for-bit. Ranges are d tiny dimension-keyed
    * aggregates (map-side combined) packed into ONE broadcast row; the
    * decode runs once per corpus ROW, never per candidate pair. A
    * constant dimension (step 0) codes to 0 and reconstructs to its lo.
    */
  private def sq8Reconstructed(c: DataFrame, corpus: DataFrame): DataFrame = {
    // derive the dimension from the data (the kmeansCentroids rule)
    val d = corpus.select(size(col("vec"))).head.getInt(0)
    val rg = sq8Ranges(c)
    sq8Decode(sq8Codes(c, rg, d), rg)
  }

  /** The ONE per-dimension range aggregate of the SQ8 family — one row,
    * `(los, sts)` arrays — shared by the in-flight and persisted forms. */
  private def sq8Ranges(c: DataFrame): DataFrame =
    c.select(posexplode(col("cid_v")))
      .groupBy("pos")
      .agg(min("col").as("lo"),
        ((max("col") - min("col")) / lit(256.0)).as("st"))
      .agg(array_sort(collect_list(struct(col("pos"), col("lo"), col("st")))).as("ps"))
      .select(transform(col("ps"), p => p.getField("lo")).as("los"),
        transform(col("ps"), p => p.getField("st")).as("sts"))

  /** The ONE floor-encode: byte codes per corpus vector — `(cid, codes)`. */
  private def sq8Codes(c: DataFrame, rg: DataFrame, d: Int): DataFrame =
    c.crossJoin(broadcast(rg))
      .select(col("cid"),
        transform(sequence(lit(0), lit(d - 1)), i => {
          val x = element_at(col("cid_v"), i + 1)
          val lo = element_at(col("los"), i + 1)
          val st = element_at(col("sts"), i + 1)
          when(st === 0.0, lit(0))
            .otherwise(least(lit(255), floor((x - lo) / st).cast("int")))
        }).as("codes"))

  /** The ONE midpoint decode of a codes frame — `(cid, rv)`. */
  private def sq8Decode(codes: DataFrame, rg: DataFrame): DataFrame =
    codes.crossJoin(broadcast(rg))
      .select(col("cid"),
        transform(col("codes"), (cd, i) =>
          element_at(col("los"), i + 1) +
            (cd.cast("double") + lit(0.5)) * element_at(col("sts"), i + 1))
          .as("rv"))

  /** Persist an SQ8 index: the byte codes, the one-row range table, and
    * the raw vectors (the exact-rescore side) written as three parquet
    * datasets — the build-offline / serve-online split of
    * [[writeIvfIndex]] at the scalar-quantization tier. What serving
    * SCANS for ranking is the codes dataset — one byte per dimension on
    * disk (parquet stores the int array dictionary/byte-packed), 4× less
    * ranking I/O than raw float32 — while the full-precision vectors are
    * touched only for the per-query `refine` survivors.
    */
  def writeSq8Index(corpus: DataFrame, path: String): Unit = {
    val c = prep(corpus, "cid")
    val d = corpus.select(size(col("vec"))).head.getInt(0)
    val rg = sq8Ranges(c)
    // stamp the corpus count into the codes column's schema metadata
    // (the cosineIndexAdaptive convention): it survives the parquet
    // round-trip at zero row cost, and lets a server size its refine
    // budget from the INDEX — never a count job over the store
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.corpusCount", corpus.count()).build()
    sq8Codes(c, rg, d)
      .select(col("cid"), col("codes").as("codes", stamp))
      .write.parquet(s"$path/codes")
    rg.write.parquet(s"$path/ranges")
    corpus.select(col("cid"), col("vec")).write.parquet(s"$path/vectors")
  }

  /** Query a [[writeSq8Index]] layout: decode the persisted codes against
    * the persisted ranges, rank, refine, and exact-rescore against the
    * persisted vectors. Ranges and codes are byte-identical to the
    * in-flight build, so results equal [[sq8TopK]] over the same corpus
    * and the same DuckDB oracle gates both.
    *
    * `refine = -1` — the DEFAULT — sizes the budget with
    * [[refineForCandidates]] from the corpus count STAMPED at build time
    * (a schema read, zero jobs over the store). An unstamped pre-r17
    * index must be served with an explicit refine — raising beats
    * silently guessing a budget. The default was the fixed 30 whose
    * measured recall decay (0.236 → 0.047 across decades) motivated the
    * adaptive rule; external callers relying on defaults should get the
    * measured-good behavior, not the legacy constant.
    */
  def sq8TopKIndexed(queries: DataFrame, path: String,
      k: Int = 10, refine: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    val rg = spark.read.parquet(s"$path/ranges")
    val codes = spark.read.parquet(s"$path/codes")
    val rf =
      if (refine != -1) refine
      else {
        val md = codes.schema("codes").metadata
        require(md.contains("graft.corpusCount"),
          s"SQ8 index at $path has no stamped corpus count (pre-r17 " +
            "unstamped build?) — since r17 the default refine=-1 sizes " +
            "from the stamp; pass refine explicitly (e.g. the legacy 30) " +
            "to serve this index as before, or rebuild it to adopt the stamp")
        refineForCandidates(md.getLong("graft.corpusCount"))
      }
    val rec = sq8Decode(codes, rg)
    val vectors = spark.read.parquet(s"$path/vectors")
    val approx = prep(queries, "qid").select(col("qid"), col("qid_v"))
      .crossJoin(rec)
      .where(col("qid") =!= col("cid"))
    sq8RefineRescore(approx, queries, vectors, k, rf)
  }

  /** Shared SQ8 ranking tail: the 9-decimal DECIMAL-ranked midpoint dot
    * (the PQ adot convention — the refine cutoff can never drift from the
    * oracle), per-query refine cut, exact rescore. Input must carry
    * `qid`, `qid_v`, `cid`, `rv`.
    */
  private def sq8RefineRescore(approx: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int, refine: Int): DataFrame = {
    val cand = approx
      .select(col("qid"), col("cid"),
        adotLong(round(dot_product(col("qid_v"), col("rv")), 9)).as("adot"))
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adot").desc, col("cid"))))
      .where(col("arn") <= refine).select("qid", "cid")
    rescoreTopK(cand, queries, corpus, k)
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

  /** Hard-negative mining for contrastive embedding training (the
    * ANCE-style "near but wrong" selection, Xiong et al. 2021,
    * arXiv:2007.00808): for each query vector, the top-k most-similar
    * corpus vectors whose `label` DIFFERS from the query's — the
    * negatives that actually shape a decision boundary, as opposed to
    * random negatives the model already separates.
    *
    * Inputs carry (qid|cid, vec, label). The candidate cut is the
    * [[lshTopKBanded]] machinery (id-only band shuffle, OR-amplified
    * buckets); labels join in at rescore time with the vectors — int-sized
    * columns on candidate-count rows — and the mismatch filter runs BEFORE
    * ranking, so negatives crowded out by same-label neighbors still
    * surface. Exact cosine, rank ties to cid.
    */
  def hardNegatives(
      queries: DataFrame, // (qid, vec, label)
      corpus: DataFrame,  // (cid, vec, label)
      k: Int = 5,
      planesPerBand: Int = 4,
      bands: Int = 4,
  ): DataFrame = {
    def banded(df: DataFrame, id: String) =
      prep(df, id).select(col(id), posexplode(
          graft.functions.BandFunctions.band_buckets(col(s"${id}_v"), planesPerBand, bands)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val cand = banded(queries, "qid").join(banded(corpus, "cid"), Seq("band", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val scored = cand
      .join(prep(queries, "qid"), "qid")
      .join(prep(corpus, "cid"), "cid")
      .join(queries.select(col("qid"), col("label").as("qlabel")), "qid")
      .join(corpus.select(col("cid"), col("label").as("neg_label")), "cid")
      .where(col("qlabel") =!= col("neg_label"))
      .select(col("qid"), col("cid"), col("neg_label"),
        round(dot_product(col("qid_v"), col("cid_v")) /
          (col("qid_n") * col("cid_n")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
  }

  /** Corpus-level embedding feature prep: mean-center every vector on the
    * corpus centroid, then L2-normalize — the standard conditioning step
    * before k-means / cosine ANN (removes the common-direction bias that
    * makes raw embedding cosines cluster near 1). A zero vector after
    * centering (a vector AT the centroid) stays zero rather than
    * dividing by its own zero norm.
    *
    * Scale shape: the mean is 64 dimension-keyed partial aggregates
    * (map-side combined, DECIMAL-exact so the centroid is partition-order
    * independent), collected into ONE broadcast array; the
    * center+normalize pass is then a row-local projection. Components
    * round to 6 decimals at output (the cosine-family convention).
    */
  /** ±1 entry of the JL projection matrix at plane `p`, dimension `i`
    * (1-based). Two modular SQUARES break the affine structure that
    * correlated the original one-step Lehmer generator's rows (measured
    * mean |corr| 0.51 over 64 dims — a 0.48 mean cosine distortion at
    * 16 output dims, vs the ~1/√16 theory; by r15 the same flaw was
    * measured collapsing the LSH bucket space, so [[bandSign]] now uses
    * this mixing too, under its own salt/bit so the two plane families
    * stay independent). Measured mean |corr| 0.11 ≈ the 1/√64
    * independent-row level. All intermediates < 2⁶² (s < 2³¹ squares
    * safely), so DuckDB replays it in overflow-checked BIGINT.
    */
  def projSign(p: Int, i: Int): Double = {
    val P31 = 2147483647L
    val s = (1000003L * p + 7919L * i + 12345L) % P31
    val x1 = (s * s) % P31
    val x2 = ((x1 + s) * 48271L) % P31
    val x3 = (x2 * x2) % P31
    if (((x3 >> 13) & 1L) == 1L) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss SIGN projection: reduce each embedding to
    * `outDims` coordinates `y_p = ⟨v, s_p⟩` against the deterministic
    * ±1 matrix ([[projSign]] — data-independent, no stored model, the
    * oracle recomputes it in SQL). Achlioptas 2001 shows ±1 entries carry the full JL
    * distance-preservation guarantee; the common `1/√outDims` scale is
    * OMITTED — cosine and relative-distance comparisons are invariant
    * to it, and leaving it off keeps the output the plain signed sums.
    * Components round to 6 decimals at output (the family convention).
    *
    * Scale shape: one row-local projection — the sign matrix constant-
    * folds into the plan, `Exprs.let` binds the double-cast vector once,
    * zero exchanges. `firstPlane` offsets select an independent matrix
    * (e.g. keep the banding planes and the projection planes disjoint).
    */
  def signProject(corpus: DataFrame, idCol: String, vecCol: String,
      outDims: Int, firstPlane: Int = 0): DataFrame = {
    require(outDims >= 1 && outDims <= MaxDims,
      s"outDims out of [1, $MaxDims]: $outDims")
    // raw projections via the one-pass kernel (bit-identical to the
    // per-plane DotProduct folds); the 6-decimal rounding stays Spark's
    // own `round`, so output doubles are byte-for-byte unchanged
    corpus.select(col(idCol),
      transform(
        graft.functions.BandFunctions.plane_dots(
          transform(col(vecCol), x => x.cast("double")), outDims, "proj",
          firstPlane),
        d => round(d, 6)).as("proj"))
  }

  /** ANN via JL project-then-rescore: candidates rank by PROJECTED-space
    * cosine — a `outDims/64`-cost ranking dot against [[signProject]]'s
    * deterministic matrix — the refine best per query rescore exactly in
    * full space (the [[sq8TopK]] coarse-then-refine composition one
    * compression family over: quantize bytes vs project dimensions).
    * Projected vectors are the ROUNDED signProject output, so a serve
    * path can equally rank against a persisted projected table and land
    * on identical candidates. A zero-norm projection scores −2 (below
    * every cosine) instead of NULL-ranking nondeterministically.
    */
  def projectedTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame,  // (cid, vec)
      k: Int = 10,
      outDims: Int = 16,
      refine: Int = 30,
      firstPlane: Int = 100,
  ): DataFrame = {
    val cp = signProject(corpus.select(col("cid"), col("vec")), "cid", "vec",
        outDims, firstPlane)
      .select(col("cid"), col("proj").as("cp"))
    val qp = signProject(queries.select(col("qid"), col("vec")), "qid", "vec",
        outDims, firstPlane)
      .select(col("qid"), col("proj").as("qp"))
    rescoreTopK(projectedCandidates(qp, cp, refine), queries, corpus, k)
  }

  /** Shared projected-space candidate stage: rank corpus projections per
    * query by projected cosine (9-decimal DECIMAL — the family's no-drift
    * convention), keep `refine` per query, ids only downstream. Inputs
    * carry `(qid, qp)` / `(cid, cp)` rounded projections.
    */
  private def projectedCandidates(qp: DataFrame, cp: DataFrame,
      refine: Int): DataFrame =
    qp.withColumn("qp_n", norm(col("qp")))
      .crossJoin(cp.withColumn("cp_n", norm(col("cp"))))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        adotLong(when(col("qp_n") * col("cp_n") =!= 0.0,
          round(dot_product(col("qp"), col("cp")) /
            (col("qp_n") * col("cp_n")), 9))
          .otherwise(lit(-2.0))).as("adot"))
      .withColumn("arn", row_number().over(
        Window.partitionBy("qid").orderBy(col("adot").desc, col("cid"))))
      .where(col("arn") <= refine).select("qid", "cid")

  /** Persist a JL projected index: the ROUNDED `outDims`-dim projections
    * (what serving ranks against — `outDims/64` of the raw ranking I/O)
    * plus the raw vectors (the exact-rescore side) — the build-offline /
    * serve-online split every other ANN tier has ([[writeIvfIndex]],
    * [[writeSq8Index]], the dedup band indexes). Projections are exactly
    * [[signProject]]'s output, so a serve over the persisted table lands
    * on the same candidates as the in-flight [[projectedTopK]].
    */
  def writeProjectedIndex(corpus: DataFrame, path: String,
      outDims: Int = 16, firstPlane: Int = 100): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    signProject(corpus.select(col("cid"), col("vec")), "cid", "vec",
        outDims, firstPlane)
      .select(col("cid"), col("proj"))
      .write.parquet(s"$path/projected")
    corpus.select(col("cid"), col("vec")).write.parquet(s"$path/vectors")
    // the projection parameters ARE part of the index: a serve that
    // re-projects queries with different (outDims, firstPlane) ranks in a
    // DIFFERENT space and silently returns a wrong candidate set — so
    // persist them and validate at read time. The corpus count rides
    // along (the sq8/cosine stamp convention) so a server can size its
    // refine budget from the meta, never from a count job over the store
    Seq((outDims, firstPlane, corpus.count()))
      .toDF("outDims", "firstPlane", "corpusCount")
      .coalesce(1).write.parquet(s"$path/meta")
  }

  /** Query a [[writeProjectedIndex]] layout: rank against the persisted
    * projections, refine, exact-rescore against the persisted vectors.
    * Bit-identical projections → results equal [[projectedTopK]] over the
    * same corpus, and the same DuckDB oracle gates both.
    *
    * `outDims`/`firstPlane` default to the values PERSISTED at build time
    * (pass -1 = "from meta"); an explicit value that disagrees with the
    * index's meta raises instead of silently ranking in the wrong
    * projected space. `refine` likewise defaults to -1 = sized by
    * [[refineForCandidates]] from the persisted corpus count (a pre-count
    * meta raises — the sq8TopKIndexed rule), so default callers get the
    * measured-good adaptive budget, not the legacy fixed 30.
    */
  def projectedTopKIndexed(queries: DataFrame, path: String,
      k: Int = 10, outDims: Int = -1, refine: Int = -1,
      firstPlane: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    // pre-meta indexes (written before the meta file existed) stay
    // servable WHEN the caller supplies both parameters explicitly.
    // ONLY a genuinely-absent meta directory takes that path — a corrupt
    // or unreadable meta must STILL raise, or the wrong-projection-space
    // guard the meta exists for would silently disable itself
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDf =
      if (!fs.exists(metaPath)) None
      else Some(spark.read.parquet(s"$path/meta"))
    val meta = metaDf.map(
      _.select(col("outDims").cast("int"), col("firstPlane").cast("int"))
        .head())
    require(meta.isDefined || (outDims >= 0 && firstPlane >= 0),
      s"projected index at $path has no meta file and the caller did not " +
        "pass explicit (outDims, firstPlane) — cannot infer the projection space")
    val (metaDims, metaPlane) = meta
      .map(m => (m.getInt(0), m.getInt(1)))
      .getOrElse((outDims, firstPlane))
    require(outDims == -1 || outDims == metaDims,
      s"projected index at $path was built with outDims=$metaDims, caller passed $outDims")
    require(firstPlane == -1 || firstPlane == metaPlane,
      s"projected index at $path was built with firstPlane=$metaPlane, caller passed $firstPlane")
    // refine = -1: size the budget from the corpus count the meta carries
    // (a one-row read already in hand — zero jobs over the store); a
    // pre-count meta must be served with an explicit refine
    val rf =
      if (refine != -1) refine
      else {
        val counted = metaDf.filter(_.schema.fieldNames.contains("corpusCount"))
        require(counted.isDefined,
          s"projected index at $path has no persisted corpus count " +
            "(pre-r17 meta?) — since r17 the default refine=-1 sizes from " +
            "the stamp; pass refine explicitly (e.g. the legacy 30) to " +
            "serve this index as before, or rebuild it to adopt the stamp")
        refineForCandidates(
          counted.get.select(col("corpusCount").cast("long")).head().getLong(0))
      }
    val cp = spark.read.parquet(s"$path/projected")
      .select(col("cid"), col("proj").as("cp"))
    val vectors = spark.read.parquet(s"$path/vectors")
    val qp = signProject(queries.select(col("qid"), col("vec")), "qid", "vec",
        metaDims, metaPlane)
      .select(col("qid"), col("proj").as("qp"))
    rescoreTopK(projectedCandidates(qp, cp, rf), queries, vectors, k)
  }

  def normalizeEmbeddings(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    import graft.functions.Exprs
    val withV = corpus.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    // exact decimal(38,18)-semantics mean on the split-int64 fast path
    // (functions.DecimalSumOps: the decimal SUM's non-compact
    // accumulation measured ~4.5x the double sum on this 1.28M-row
    // explode at sf1.0; values are unchanged, DecimalSumSpec-pinned)
    val mu = withV.select(col(idCol), posexplode(col("v")))
      .groupBy("pos")
      .agg((graft.functions.DecimalSumOps.dsum_exact_split(col("col"), 18) /
        count(lit(1)).cast("double")).as("mu"))
    val muArr = mu
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
      .select(transform(col("pm"), p => p.getField("mu")).as("mu"))
    withV.crossJoin(broadcast(muArr))
      .select(col(idCol),
        Exprs.let(zip_with(col("v"), col("mu"), (x, m) => x - m), { cv =>
          Exprs.let(norm(cv), { nrm =>
            when(nrm =!= lit(0.0), transform(cv, c => round(c / nrm, 6)))
              .otherwise(transform(cv, c => round(c, 6)))
          })
        }).as("nvec"))
  }

  /** Embedding-space dataset card: per trained-quantizer cell, the vector
    * count and the distribution of cosine-to-own-centroid (mean exact via
    * DECIMAL accumulation, min/max rounded at output) — the cluster-
    * balance / compactness report a curation run logs next to the corpus
    * manifest, and the "is one cell swallowing the corpus" check before
    * [[graft.ops.Dedup.semanticDedup]]'s per-cell pair stage.
    * One broadcast-centroid argmax pass + one map-side-combined aggregate
    * keyed by (at most) the quantizer size.
    */
  def cellProfile(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = prep(corpus, "cid")
    val w = Window.partitionBy(col("cid")).orderBy(col("csim").desc, col("centId"))
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("cid"), col("centId"),
        (dot_product(col("cid_v"), col("cent_v")) /
          (col("cid_n") * col("cent_n"))).as("csim"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    assigned.groupBy(col("centId").as("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        round(graft.functions.DecimalSumOps.dsum_exact_split(col("csim"), 18) /
          count(lit(1)).cast("double"), 6).as("avg_csim"),
        round(min(col("csim")), 6).as("min_csim"),
        round(max(col("csim")), 6).as("max_csim"))
  }
}
