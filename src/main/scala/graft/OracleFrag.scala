package graft

import graft.ops.Similarity

/** DuckDB SQL fragment builders that mirror the native hash kernels in
  * [[graft.functions.TextHashOps]] and [[graft.ops.Similarity]] formula-
  * for-formula (same mod-arithmetic, same fold order), so the driver's
  * oracle recomputes LSH candidates and scores exactly — the correctness
  * gate covers the whole dedup/ANN pipeline, not just row counts.
  */
private[graft] object OracleFrag {

  val P57 = "144115188075855859" // (1<<57) - 13
  val P31 = "2147483647"

  /** Normalized word list of a text expression (mirror of TextAnalysis.words). */
  def ws(text: String): String =
    s"""list_filter(string_split(regexp_replace(lower($text), '[^a-z0-9 ]', ' ', 'g'), ' '), __w -> len(__w) > 0)"""

  /** Shared document-analysis CTE prefix: `w` (tokenized) + `s` (per-
    * language stopword hit counts) over the documents table. `extraCols`
    * are passthrough columns (e.g. ", source"). Single source of truth for
    * every oracle that mirrors TextAnalysis — a formula change here moves
    * all of them in lockstep.
    */
  def docAnalysisCtes(extraCols: String = "", from: String = "documents"): String =
    s"""w AS (
       |  SELECT doc_id$extraCols, text, ${ws("text")} AS ws
       |  FROM $from),
       |s AS (
       |  SELECT doc_id$extraCols, text, ws,
       |    len(list_filter(ws, __x -> list_contains(['the','a','of','and','to','in','is','it'], __x))) AS en,
       |    len(list_filter(ws, __x -> list_contains(['der','die','das','und','ist','ein','zu','mit'], __x))) AS de,
       |    len(list_filter(ws, __x -> list_contains(['le','la','les','et','est','un','une','des'], __x))) AS fr,
       |    len(list_filter(ws, __x -> list_contains(['el','los','las','y','es','un','una','con'], __x))) AS es
       |  FROM w)""".stripMargin

  /** Staged PII-scrub CTEs mirroring [[graft.ops.Pii.scrubExprs]] — one
    * CTE per category, each counting on the PREVIOUS stage's text and then
    * replacing (RE2's `regexp_extract_all`/`regexp_replace('g')` agree
    * with Java's engine on the lookaround-free pattern subset Pii uses).
    * Input: a CTE `<prefix>0` exposing passthrough columns plus `__t`;
    * output: `<prefix>N` with `__t` scrubbed and one `n_pii_<cat>` INT per
    * category. Driven off `Pii.categories` so a pattern change moves both
    * engines in lockstep.
    */
  def piiStages(prefix: String = "p"): String =
    graft.ops.Pii.categories.zipWithIndex.map { case ((cat, pat, repl), i) =>
      s"""$prefix${i + 1} AS (SELECT * EXCLUDE (__t),
         |  CAST(len(regexp_extract_all(__t, '$pat')) AS INT) AS n_pii_$cat,
         |  regexp_replace(__t, '$pat', '$repl', 'g') AS __t FROM $prefix$i)""".stripMargin
    }.mkString(",\n")

  /** Hashed-feature classifier score_sum over a words-list expression —
    * mirror of [[graft.functions.TextHashOps.classifierScore]] /
    * [[graft.ops.Classifier.weightOf]]: per word occurrence, one Lehmer
    * step of (poly57 mod numBuckets), summed exactly in BIGINT.
    */
  def classifierScoreSum(wsCol: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform($wsCol, __w -> CAST(
       |      (((${poly57("__w")}) % ${graft.ops.Classifier.numBuckets} + 1) * 48271) % 2001 - 1000
       |      AS BIGINT))),
       |    (__t1, __t2) -> __t1 + __t2)""".stripMargin

  /** Per-occurrence feature-bucket list of a words-list expression
    * (mirror of wordHashes mod [[graft.ops.Classifier.numBuckets]] — bag
    * semantics, repeats count). Shared by the trainer and the trained
    * scorer so both sides bucket identically.
    */
  def classifierBuckets(wsCol: String): String =
    s"""list_transform($wsCol, __w3 -> (${poly57("__w3")}) % ${graft.ops.Classifier.numBuckets})"""

  /** Classifier label over `n_words`/`score_sum` columns (mirror of
    * [[graft.ops.Classifier.classify]]'s integer cross-multiplied cut).
    */
  val classifierLabelExpr: String =
    s"""CASE WHEN n_words = 0 THEN 'empty'
       |     WHEN score_sum >= ${graft.ops.Classifier.keepMilli} * n_words THEN 'keep'
       |     WHEN score_sum <= ${graft.ops.Classifier.discardMilli} * n_words THEN 'discard'
       |     ELSE 'borderline' END""".stripMargin

  /** Symbol list of a BPE segmentation string expression: split on single
    * spaces, drop the empties the unit-owned double separators produce
    * (mirror of Bpe.symsSql).
    */
  def bpeSyms(seg: String): String =
    s"list_filter(string_split(trim($seg), ' '), __f -> len(__f) > 0)"

  /** Unrolled BPE-training CTEs mirroring [[graft.ops.Bpe.train]] round
    * for round: `wrd` (distinct words + counts, same tokenizer as `ws`),
    * `seg0` (unit-owned-space char segmentation: "abc" → " a  b  c ",
    * every symbol wrapped in its OWN spaces so adjacent pair occurrences
    * share no characters), then per round r: `pr{r}` (weighted
    * adjacent-pair counts of the current segmentation), `best{r}` (the
    * argmax with the same count-DESC, l, r tie-break) and `seg{r}` (the
    * merge applied via the identical " l  r " → " lr " left-to-right
    * replace). DuckDB's `replace` and Spark's share non-overlapping
    * left-to-right scan semantics, and with unit-owned spaces that scan
    * IS greedy BPE (both "banana" (a,n) occurrences merge), so the string
    * algebra — and therefore every subsequent round's pair counts —
    * matches exactly.
    */
  def bpeCtes(k: Int, from: String = "documents"): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"seg${r - 1}"
      s"""pr$r AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)), __i ->
         |      struct_pack(l := syms[__i], r := syms[__i + 1]))) AS p
         |    FROM (SELECT cnt, ${bpeSyms("seg")} AS syms FROM $prev))
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (SELECT l, r, CAST(c AS BIGINT) AS c FROM pr$r
         |           ORDER BY c DESC, l, r LIMIT 1),
         |seg$r AS MATERIALIZED (SELECT w, cnt, replace(seg,
         |    ' ' || (SELECT l FROM best$r) || '  ' || (SELECT r FROM best$r) || ' ',
         |    ' ' || (SELECT l FROM best$r) || (SELECT r FROM best$r) || ' ') AS seg
         |  FROM $prev)""".stripMargin
    }
    s"""wrd AS MATERIALIZED (SELECT __w AS w, COUNT(*) AS cnt
       |       FROM (SELECT unnest(${ws("text")}) AS __w FROM $from)
       |       GROUP BY 1),
       |seg0 AS MATERIALIZED (SELECT w, cnt, regexp_replace(w, '(.)', ' \\1 ', 'g') AS seg
       |         FROM wrd),
       |""".stripMargin + rounds.mkString(",\n")
  }

  /** Unrolled WordPiece-training CTEs mirroring
    * [[graft.ops.Bpe.trainWordPiece]]: same `wrd`/`seg0` prefix and the
    * same per-round pair counts and merge replace as [[bpeCtes]], plus a
    * per-round symbol-count CTE `sc{r}`, with the argmax ordered by the
    * likelihood score `c / (cl·cr)` compared as an IEEE double — both
    * engines evaluate the identical expression on identical integer
    * inputs, so the winner matches bit-for-bit; while `cl·cr ≤ 2⁵³` the
    * double order also provably never contradicts the exact rational
    * order (see Bpe.trainWordPiece), and exact-double ties fall to the
    * same (l, r) tie-break as Spark.
    */
  def wordpieceCtes(k: Int, from: String = "documents"): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"seg${r - 1}"
      s"""sc$r AS MATERIALIZED (
         |  SELECT sym, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(${bpeSyms("seg")}) AS sym FROM $prev)
         |  GROUP BY 1),
         |pr$r AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)), __i ->
         |      struct_pack(l := syms[__i], r := syms[__i + 1]))) AS p
         |    FROM (SELECT cnt, ${bpeSyms("seg")} AS syms FROM $prev))
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, CAST(p.c AS BIGINT) AS c,
         |         CAST(sl.c AS BIGINT) AS cl, CAST(sr.c AS BIGINT) AS cr
         |  FROM pr$r p JOIN sc$r sl ON sl.sym = p.l JOIN sc$r sr ON sr.sym = p.r
         |  ORDER BY CAST(p.c AS DOUBLE) / (CAST(sl.c AS DOUBLE) * CAST(sr.c AS DOUBLE)) DESC,
         |           p.l, p.r
         |  LIMIT 1),
         |seg$r AS MATERIALIZED (SELECT w, cnt, replace(seg,
         |    ' ' || (SELECT l FROM best$r) || '  ' || (SELECT r FROM best$r) || ' ',
         |    ' ' || (SELECT l FROM best$r) || (SELECT r FROM best$r) || ' ') AS seg
         |  FROM $prev)""".stripMargin
    }
    s"""wrd AS MATERIALIZED (SELECT __w AS w, COUNT(*) AS cnt
       |       FROM (SELECT unnest(${ws("text")}) AS __w FROM $from)
       |       GROUP BY 1),
       |seg0 AS MATERIALIZED (SELECT w, cnt, regexp_replace(w, '(.)', ' \\1 ', 'g') AS seg
       |         FROM wrd),
       |""".stripMargin + rounds.mkString(",\n")
  }

  /** The trained-tokenizer segmentation of a word expression under the
    * `best1..bestK` merges of [[bpeCtes]] — the mirror of
    * [[graft.ops.Bpe.segmentWithMerges]] as nested replaces with scalar
    * subqueries.
    */
  def bpeSegment(word: String, k: Int): String =
    (1 to k).foldLeft(s"regexp_replace($word, '(.)', ' \\1 ', 'g')") {
      (acc, r) =>
        s"""replace($acc,
           |  ' ' || (SELECT l FROM best$r) || '  ' || (SELECT r FROM best$r) || ' ',
           |  ' ' || (SELECT l FROM best$r) || (SELECT r FROM best$r) || ' ')""".stripMargin
    }

  /** Language guess over the `s` CTE's counts (mirror of TextAnalysis.langGuess). */
  val langGuessExpr: String =
    """CASE WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
      |       WHEN en >= greatest(de, fr, es) THEN 'en'
      |       WHEN de >= greatest(fr, es) THEN 'de'
      |       WHEN fr >= es THEN 'fr' ELSE 'es' END""".stripMargin

  /** Quality score over `s` (mirror of TextAnalysis.qualityScore, round 4). */
  val qualityExpr: String =
    """round(least(1.0,
      |    0.3 * (CASE WHEN len(ws) > 0 THEN en / CAST(len(ws) AS DOUBLE) ELSE 0.0 END)
      |    + 0.5 * least(len(ws) / 100.0, 1.0)
      |    + 0.2 * (1.0 - (CASE WHEN length(text) > 0 THEN
      |        (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
      |          / CAST(length(text) AS DOUBLE) ELSE 0.0 END))), 4)""".stripMargin

  /** Rolling word fingerprint over `ws` (mirror of TextAnalysis.fingerprint). */
  val fingerprintExpr: String =
    """list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(ws, __x -> CAST(len(__x) + 7 * ascii(substring(__x, 1, 1)) AS BIGINT))),
      |    (__p, __q) -> (__p * 31 + __q) % 2147483647)""".stripMargin

  /** Two Lehmer rounds on the P57 line (mirror of Sketch.mixedPosition) —
    * HUGEINT because the intermediate product exceeds int64.
    */
  def mix1(h: String): String =
    s"CAST(((CAST($h AS HUGEINT) + 1) * 48271 % $P57) * 48271 % $P57 AS BIGINT)"

  /** Third Lehmer round (mirror of Sketch.mixedPosition2) — the
    * double-hashing step generator for the Bloom/CMS position walks.
    */
  def mix2(h: String): String =
    s"CAST((((CAST($h AS HUGEINT) + 1) * 48271 % $P57) * 48271 % $P57) * 48271 % $P57 AS BIGINT)"

  /** Double-hashed probe position `(h1 + i·h2) mod m` over precomputed
    * `m1`/`m2` columns (mirror of Sketch.bloomPositions / cmsPosition):
    * `h1 = m1 mod m`, `h2 = 1 + (m2 mod (m−1))`, step forced nonzero.
    */
  def sketchPos(m1: String, m2: String, i: String, m: Int): String =
    s"(($m1 % $m) + $i * (1 + ($m2 % ${m - 1}))) % $m"

  /** Content-defined chunk CTE chain (mirror of TextHashOps.cdcChunks):
    * gram hashes → cut ends (gram hash ≡ 0 mod 2^maskBits, end = start +
    * k − 1 in 1-based SQL) → final-end completion → per-chunk
    * `(doc_id, start, len, h)` rows in `<p>_cdc` (zero-length rows
    * filtered: the kernel emits NO chunk for an empty text, while the
    * SQL end-completion would otherwise produce one (0,0,0) row).
    * `from` supplies
    * `doc_id, text` (plus passthrough via `extraCols`, e.g. ", source").
    */
  def cdcCtes(k: Int, maskBits: Int, from: String = "documents",
      p: String = "c", extraCols: String = ""): String = {
    val m = 1L << maskBits
    s"""${p}g AS (SELECT doc_id$extraCols, text,
       |    list_transform(range(1, length(text) - $k + 2),
       |      __i -> ${poly57(s"substr(text, CAST(__i AS INT), $k)")}) AS g
       |  FROM $from),
       |${p}e AS (SELECT doc_id$extraCols, text,
       |    list_transform(list_filter(range(1, len(g) + 1), __i -> g[__i] % $m = 0),
       |      __i -> __i + ${k - 1}) AS e0
       |  FROM ${p}g),
       |${p}f AS (SELECT doc_id$extraCols, text,
       |    CASE WHEN len(e0) = 0 OR e0[-1] != length(text)
       |         THEN list_append(e0, CAST(length(text) AS BIGINT)) ELSE e0 END AS ee
       |  FROM ${p}e),
       |${p}j AS (SELECT doc_id$extraCols, text, ee,
       |    unnest(range(1, len(ee) + 1)) AS j
       |  FROM ${p}f),
       |${p}d AS (SELECT doc_id$extraCols, text,
       |    CASE WHEN j = 1 THEN 0 ELSE ee[CAST(j - 1 AS INT)] END AS start,
       |    ee[CAST(j AS INT)] - CASE WHEN j = 1 THEN 0 ELSE ee[CAST(j - 1 AS INT)] END AS len
       |  FROM ${p}j),
       |${p}_cdc AS (SELECT doc_id$extraCols, start, len,
       |    ${poly57("substr(text, CAST(start + 1 AS INT), CAST(len AS INT))")} AS h
       |  FROM ${p}d WHERE len > 0)""".stripMargin
  }

  /** Rolling poly-57 hash of a string expression (mirror of TextHashOps.foldBytes). */
  def poly57(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, len($s) + 1), __j -> CAST(ascii(($s)[__j]) AS BIGINT))), (__a, __c) -> (__a * 31 + __c) % $P57)"""

  /** Distinct shingle-hash list from a words-list expression (n = 3). */
  def shingleHashes(wsCol: String): String = {
    val sh = s"($wsCol[__i] || ' ' || $wsCol[__i+1] || ' ' || $wsCol[__i+2])"
    s"""list_distinct(list_transform(range(1, len($wsCol) - 1), __i -> ${poly57(sh)}))"""
  }

  /** POSITIONAL shingle-hash list (n = 3): index i (1-based) = the
    * shingle starting at word i — [[shingleHashes]] without the distinct
    * (mirror of TextHashOps.shingleHashesAt). */
  def shingleHashesAt(wsCol: String): String = {
    val sh = s"($wsCol[__i] || ' ' || $wsCol[__i+1] || ' ' || $wsCol[__i+2])"
    s"""list_transform(range(1, len($wsCol) - 1), __i -> ${poly57(sh)})"""
  }

  /** Winnowing selection over a gram-hash LIST expression `g` (1-based):
    * the distinct window-minimum hashes, ties → rightmost — mirror of
    * TextHashOps.winnowHashes' selection rule. For each window start j,
    * the rightmost minimum's global index is
    * `j + slen − pos(reverse(slice), min(slice))` with
    * `slen = end − j + 1`. */
  def winnowSelected(g: String, w: Int): String = {
    val end = s"LEAST(j + ${w - 1}, len($g))"
    val sl = s"list_slice($g, j, $end)"
    s"""list_distinct(list_transform(range(1, GREATEST(len($g) - $w, 0) + 2),
       |      j -> $g[j + ($end - j + 1) - list_position(list_reverse($sl), list_min($sl))]))""".stripMargin
  }

  /** Deterministic two-step Lehmer unit hash of a row id (mirror of
    * Sampling.unitHash — same mod arithmetic, integer-only). */
  def unitHash(id: String): String =
    s"(((($id % $P31 + 1) * 48271) % $P31) * 48271) % $P31"

  /** MinHash signature list over a shingle-hash-list expression. */
  def minhashSig(shsCol: String, k: Int): String =
    s"""list_transform(range(0, $k), __q -> list_min(list_transform($shsCol, __h -> ((2*__q + 3) * (__h % $P31) + (__q*__q + 7*__q + 41)) % $P31)))"""

  /** Packed 31-bit simhash over a words-list expression (−∞-free: caller
    * filters len(ws) > 0, mirroring the Spark −1 sentinel filter). */
  def simhash31(wsCol: String): String = {
    val wordHashes = s"list_transform($wsCol, __w2 -> ${poly57("__w2")} % $P31)"
    s"""CAST(list_sum(list_transform(range(0, 31), __b ->
       |  CASE WHEN list_sum(list_transform($wordHashes, __h2 ->
       |    CASE WHEN ((__h2 >> __b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN (CAST(1 AS BIGINT) << __b) ELSE 0 END)) AS BIGINT)""".stripMargin
  }

  /** Sequential dot product of two double-list expressions over dims 1..64
    * (mirror of DotProduct's 0..n-1 fold; bit-identical IEEE order). */
  def dot64(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65), __i -> ($a)[__i] * ($b)[__i])), (__x, __y) -> __x + __y)"""

  /** Sequential dot over subspace `sVar` (0-based column expr) of width
    * `subDim` — mirrors the Spark `slice` + DotProduct fold order. */
  def subDot(a: String, b: String, sVar: String, subDim: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${subDim + 1}), __i -> ($a)[$sVar*$subDim + __i] * ($b)[$sVar*$subDim + __i])), (__x, __y) -> __x + __y)"""

  /** Mixed-subspace dot: slice `sVar` of full-width `a` against an
    * ALREADY-SLICED `subDim`-wide `b` (a trained-codebook centroid) —
    * the fold order of `DotProduct(slice(v), cb_sub)`. */
  def subDotFix(a: String, b: String, sVar: String, subDim: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${subDim + 1}), __i -> ($a)[$sVar*$subDim + __i] * ($b)[__i])), (__x, __y) -> __x + __y)"""

  /** Sequential dot of two `n`-wide double-list expressions (dims 1..n). */
  def dotN(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${n + 1}), __i -> ($a)[__i] * ($b)[__i])), (__x, __y) -> __x + __y)"""

  /** ±1 sign of LSH banding hyperplane p at lambda-var dim `iVar`
    * (mirror of Similarity.bandSign — the projSign two-modular-squares
    * mixing under the banding family's own salt/bit; all intermediates
    * < 2⁶² in overflow-checked BIGINT). */
  private def bandSignSql(p: Int, iVar: String): String = {
    val base = s"((${1000003L * p + 54321L} + 7919*$iVar) % $P31)"
    s"""CASE WHEN ((((($base * $base) % $P31 + $base) * 48271) % $P31)
       |      * (((($base * $base) % $P31 + $base) * 48271) % $P31) % $P31 >> 17) & 1 = 1
       |  THEN 1.0 ELSE -1.0 END""".stripMargin
  }

  /** Dot of a double-list expression with banding hyperplane p over dims
    * 1..64. */
  def planeDot(v: String, p: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65), __i -> ($v)[__i] * ${bandSignSql(p, "__i")})), (__x, __y) -> __x + __y)"""

  /** ±1 JL-projection matrix entry (mirror of Similarity.projSign: two
    * modular squares break the affine structure that correlates
    * planeSign's rows; all intermediates < 2⁶²). */
  private def projSignSql(p: Int, iVar: String): String = {
    val base = s"((${1000003L * p + 12345L} + 7919*$iVar) % $P31)"
    s"""CASE WHEN ((((($base * $base) % $P31 + $base) * 48271) % $P31)
       |      * (((($base * $base) % $P31 + $base) * 48271) % $P31) % $P31 >> 13) & 1 = 1
       |  THEN 1.0 ELSE -1.0 END""".stripMargin
  }

  /** Dot of a double-list expression with JL plane p over dims 1..64. */
  def projDot(v: String, p: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65), __i -> ($v)[__i] * ${projSignSql(p, "__i")})), (__x, __y) -> __x + __y)"""

  /** Packed sign-bit bucket of `planes` hyperplanes starting at firstPlane
    * (first plane = MSB; mirror of Similarity.hyperplaneBucket). */
  def bucket(v: String, planes: Int, firstPlane: Int): String =
    (0 until planes).map { j =>
      val p = firstPlane + j
      s"(CASE WHEN ${planeDot(v, p)} > 0 THEN ${1L << (planes - 1 - j)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Query-side multi-probe bucket list (mirror of
    * Similarity.hyperplaneProbes): the exact bucket plus `probes` variants
    * with the weakest sign bits flipped — planes ranked by (|dot| asc, j
    * asc), exactly Spark's sort_array over struct(a, j). Returns a
    * DuckDB list of 1 + probes BIGINT buckets.
    */
  def probeBuckets(v: String, planes: Int, firstPlane: Int, probes: Int): String = {
    val ranked = (0 until planes)
      .map(j => s"{'a': abs(${planeDot(v, firstPlane + j)}), 'j': $j}")
      .mkString("[", ",\n      ", "]")
    val b = s"CAST(${bucket(v, planes, firstPlane)} AS BIGINT)"
    s"""list_prepend($b, list_transform(list_slice(list_sort($ranked), 1, $probes),
       |  __s -> xor($b, CAST(1 AS BIGINT) << (${planes - 1} - __s.j))))""".stripMargin
  }

  // --------------------------------------------------------------------
  // Count-adaptive banding (mirror of Similarity.planesForCorpus sizing).
  // The shipped cosine-LSH queries size planesPerBand from the CORPUS
  // COUNT (constant-occupancy rule), so their oracles can no longer bake a
  // fixed plane count into the SQL string — the same oracle text must pick
  // 6 planes at a 500-vector corpus and 8 at 2000. These builders compute
  // `planes` from count(*) IN SQL and evaluate the band-sign formula with
  // the plane index as a runtime variable; both forms were verified
  // byte-identical to the static [[bucket]]/[[probeBuckets]] expansions.

  /** [[bandSignSql]] with the plane index as a runtime variable instead of
    * a Scala-folded literal — same arithmetic, same overflow bounds (p is
    * ≤ bands·maxPlanes ≤ a few hundred, so 1000003·p stays far below the
    * P31 squares that dominate the 2⁶² budget). */
  private def bandSignVarSql(pVar: String, iVar: String): String = {
    val base = s"((1000003*$pVar + 7919*$iVar + 54321) % $P31)"
    s"""CASE WHEN ((((($base * $base) % $P31 + $base) * 48271) % $P31)
       |      * (((($base * $base) % $P31 + $base) * 48271) % $P31) % $P31 >> 17) & 1 = 1
       |  THEN 1.0 ELSE -1.0 END""".stripMargin
  }

  /** Scalar SQL mirroring [[Similarity.planesForCorpus]] exactly: the
    * smallest p in [0, maxPlanes) with 2^p ≥ ceil(count/target), else
    * maxPlanes, clamped below by minPlanes — the same integer loop, so
    * there is no log2 double-rounding drift at the 2^k boundaries.
    * `countSql` is a scalar subquery text (e.g. "SELECT count(*) FROM n").
    */
  def planesForCorpusSql(countSql: String, target: Int = 8,
      minPlanes: Int = 4, maxPlanes: Int = 30): String =
    s"""GREATEST($minPlanes, COALESCE((SELECT MIN(p) FROM range(0, $maxPlanes) __r(p)
       |  WHERE (CAST(1 AS BIGINT) << CAST(p AS INT)) >= ((($countSql) - 1) // $target + 1)), $maxPlanes))""".stripMargin

  /** CTE pair `__pl` (the adaptive plane count) + `__sgn` (the banding
    * sign matrix as (p, 64-double row) for planes 0 until bands·maxSgnPlanes
    * — built once, joined by every band CTE). `maxSgnPlanes` only bounds
    * the precomputed matrix; 16 covers any corpus this oracle gates
    * (2^16 buckets/band · target 8 ≈ half a million vectors). */
  def adaptivePlanesCtes(countSql: String, bands: Int, target: Int = 8,
      minPlanes: Int = 4, maxSgnPlanes: Int = 16): String =
    s"""__pl AS (SELECT CAST(${planesForCorpusSql(countSql, target, minPlanes, maxSgnPlanes)} AS INT) AS planes),
       |__sgn AS (
       |  SELECT p, list_transform(range(1, 65), __i -> ${bandSignVarSql("p", "__i")}) AS sr
       |  FROM range(0, ${bands * maxSgnPlanes}) __r(p))""".stripMargin

  /** Adaptive banded rows `(vec_id, band, bucket)` over CTE `from` (which
    * must expose vec_id and v) — the variable-planes form of the static
    * per-band [[bucket]] UNION: one dot per (row, plane) against the
    * `__sgn` matrix, sign bits packed MSB-first per band by SUM (mirror of
    * Similarity.hyperplaneBucket's fold). Requires [[adaptivePlanesCtes]]
    * in scope. `where` optionally filters the input rows (query side). */
  def adaptiveBandCte(out: String, bands: Int, from: String = "n",
      where: String = ""): String =
    s"""$out AS (
       |  SELECT $from.vec_id, CAST(s.p // pl.planes AS INT) AS band,
       |    CAST(SUM(CASE WHEN ${dot64(s"$from.v", "s.sr")} > 0
       |      THEN (CAST(1 AS BIGINT) << CAST(pl.planes - 1 - (s.p % pl.planes) AS INT)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM $from CROSS JOIN __pl pl JOIN __sgn s ON s.p < $bands * pl.planes
       |  $where
       |  GROUP BY 1, 2)""".stripMargin

  /** Adaptive multi-probe query rows `(vec_id, band, bucket)`: the exact
    * bucket plus `probes` weakest-|dot| bit flips per band (mirror of
    * [[probeBuckets]] with planes a runtime variable — per-(vec, band)
    * dots aggregated into the packed bucket AND the (|dot|, j)-ranked
    * flip list). Requires [[adaptivePlanesCtes]] in scope. */
  def adaptiveProbeCtes(out: String, bands: Int, probes: Int,
      from: String = "n", where: String = ""): String =
    s"""__qd AS (
       |  SELECT $from.vec_id, CAST(s.p // pl.planes AS INT) AS band,
       |    CAST(s.p % pl.planes AS INT) AS j, ${dot64(s"$from.v", "s.sr")} AS d, pl.planes AS planes
       |  FROM $from CROSS JOIN __pl pl JOIN __sgn s ON s.p < $bands * pl.planes
       |  $where),
       |__qb AS (
       |  SELECT vec_id, band, planes,
       |    CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << CAST(planes - 1 - j AS INT)) ELSE 0 END) AS BIGINT) AS bucket,
       |    list_sort(list({'a': abs(d), 'j': j})) AS ranked
       |  FROM __qd GROUP BY vec_id, band, planes),
       |$out AS (
       |  SELECT vec_id, band, unnest(list_prepend(bucket,
       |    list_transform(list_slice(ranked, 1, $probes),
       |      __s -> xor(bucket, CAST(1 AS BIGINT) << CAST(planes - 1 - __s.j AS INT))))) AS bucket
       |  FROM __qb)""".stripMargin

  // --------------------------------------------------------------------
  // Count-adaptive IVF sizing (mirror of Similarity.nlistForCorpus +
  // Similarity.nprobeForCells). The shipped seeded-IVF queries size nlist
  // from the CORPUS COUNT (constant-cell-size rule) and nprobe from nlist
  // (constant-probed-fraction policy), so their oracles compute the same
  // two integers from count(*) IN SQL — one oracle text is correct at
  // every SF, exactly the adaptivePlanesCtes contract for LSH banding.

  /** CTE pair `__nl` (nlist = clamp(ceil(count/targetCell), min, max))
    * + `__np` (nprobe = clamp(ceil(nlist/probeDen), minProbe, nlist)) —
    * integer arithmetic only, so there is no rounding drift against the
    * Scala rules at any boundary. `countSql` is a scalar subquery text.
    */
  def ivfSizingCtes(countSql: String, targetCell: Int = 125,
      minNlist: Int = 8, maxNlist: Int = 1 << 20,
      probeDen: Int = 4, minProbe: Int = 2): String =
    s"""__nl AS (SELECT CAST(GREATEST($minNlist, LEAST($maxNlist,
       |    (($countSql) - 1) // $targetCell + 1)) AS INT) AS nlist),
       |__np AS (SELECT CAST(LEAST(nlist, GREATEST($minProbe,
       |    (nlist + ${probeDen - 1}) // $probeDen)) AS INT) AS nprobe FROM __nl)""".stripMargin

  /** CTE `__rf` — the count-adaptive exact-rescore budget, mirror of
    * [[Similarity.refineForCandidates]]: `clamp(ceil(candidates /
    * refineDen), minRefine, maxRefine)` in integer arithmetic only.
    * `candSql` is scalar SQL for the approximately-RANKED pool the cut
    * applies to — `SELECT count(*) FROM e` for the exhaustive PQ/SQ8/JL
    * tiers, `(count · nprobe) // nlist` (see [[probedCandSql]]) for the
    * IVF-routed ones — so one oracle text stays correct at every SF,
    * exactly the ivfSizingCtes/adaptivePlanesCtes contract.
    */
  def refineCte(candSql: String, refineDen: Int = Similarity.RefineDen,
      minRefine: Int = 30, maxRefine: Int = 1 << 16): String =
    s"""__rf AS (SELECT CAST(GREATEST($minRefine, LEAST($maxRefine,
       |    CASE WHEN ($candSql) = 0 THEN 0
       |         ELSE (($candSql) - 1) // $refineDen + 1 END)) AS INT) AS refine)""".stripMargin

  /** Scalar SQL for the expected IVF probed population — mirror of
    * [[Similarity.expectedProbed]] (multiply-before-divide floor), over
    * the `__nl`/`__np` CTEs an [[ivfSizingCtes]] call put in scope. */
  def probedCandSql(countSql: String): String =
    s"(($countSql) * (SELECT nprobe FROM __np)) // (SELECT nlist FROM __nl)"

  /** CTE `__kc` — the count-adaptive PQ codebook resolution, mirror of
    * [[Similarity.kCodeForCorpus]]: `clamp(ceil(count / targetPerCode),
    * minKCode, maxKCode)` in integer arithmetic only. The seeded-codebook
    * PQ oracles select their `kc` smallest-id vectors with it, so one
    * oracle text sizes the codebook correctly at every SF — the
    * ivfSizingCtes/refineCte contract extended to the last fixed ANN dial.
    */
  def kCodeCte(countSql: String, targetPerCode: Int = 125,
      minKCode: Int = 16, maxKCode: Int = 256): String =
    s"""__kc AS (SELECT CAST(GREATEST($minKCode, LEAST($maxKCode,
       |    (($countSql) - 1) // $targetPerCode + 1)) AS INT) AS kc)""".stripMargin

  /** Sanity pin: the SQL nlist/nprobe rules reimplemented here must agree
    * with Similarity.nlistForCorpus / nprobeForCells — the cross-engine
    * guard every count-adaptive rule carries, covering the gate corpus
    * sizes (500, 2000, 20000) plus the clamp and ceil boundaries.
    */
  require(Seq(1L, 124L, 125L, 126L, 500L, 999L, 1000L, 1001L, 2000L,
      20000L, 1000000L).forall { n =>
    val sqlNlist = math.max(8L, math.min(1L << 20, (n - 1) / 125 + 1)).toInt
    val sqlNprobe = math.min(sqlNlist, math.max(2, (sqlNlist + 3) / 4))
    sqlNlist == Similarity.nlistForCorpus(n) &&
      sqlNprobe == Similarity.nprobeForCells(sqlNlist)
  })

  /** Sanity pin: the SQL refine rule reimplemented here must agree with
    * Similarity.refineForCandidates — covering the zero/floor/ceil/cap
    * boundaries and the gate pool sizes (corpus 500/2000/20000 for the
    * exhaustive tiers, probed 125/500/5000 for the IVF-routed ones), at
    * both bracketing denominators the r17 RecallX100 table measured. */
  require(Seq(16, 64).forall { den =>
    Seq(0L, 1L, 29L, 30L, 31L, 124L, 125L, 479L, 480L, 481L, 500L, 2000L,
        5000L, 20000L, 50000L, 1048575L, 1048576L * 64L + 1L).forall { n =>
      val frac = if (n == 0) 0L else (n - 1) / den + 1
      val sqlRefine = math.max(30L, math.min(65536L, frac)).toInt
      sqlRefine == Similarity.refineForCandidates(n, refineDen = den)
    }
  })

  /** Sanity pin: the SQL kCode rule reimplemented here must agree with
    * Similarity.kCodeForCorpus — covering the gate corpus sizes (200,
    * 500, 2000, 20000 — the floor regime and the first adaptive decade)
    * plus the ceil boundaries and the 256 byte-code cap. */
  require(Seq(1L, 124L, 125L, 126L, 200L, 500L, 2000L, 2001L, 20000L,
      31999L, 32000L, 32001L, 200000L, 10000000L).forall { n =>
    val sqlKc = math.max(16L, math.min(256L, (n - 1) / 125 + 1)).toInt
    sqlKc == Similarity.kCodeForCorpus(n)
  })

  /** Sanity pin (r19): every PQ oracle text hardcodes m = 8 subspaces
    * (the dot/slice expressions are unrolled per subspace), so
    * Similarity.mForCorpus must sit on its baseM = 8 floor at every
    * corpus size the gates run (500, 2000, 20000) and through the whole
    * kCode growth range — the rule's first doubling is only past
    * 256·125·8 = 256000 vectors, where the queries' own parity require
    * raises before a stale oracle could compare. */
  require(Seq(1L, 500L, 2000L, 20000L, 200000L, 256000L).forall { n =>
    Similarity.mForCorpus(n) == 8
  } && Similarity.mForCorpus(256001L) == 16 &&
    Similarity.mForCorpus(512001L) == 32 &&
    Similarity.mForCorpus(100000000L) == 64)

  /** Sanity pin: the Scala and SQL band-sign formulas must agree. */
  require((0 until 4).forall(p => (1 to 8).forall { i =>
    val base = (1000003L * p + 54321L + 7919L * i) % 2147483647L
    val x2 = ((base * base % 2147483647L) + base) * 48271L % 2147483647L
    val x3 = x2 * x2 % 2147483647L
    val sqlSign = if (((x3 >> 17) & 1L) == 1L) 1.0 else -1.0
    sqlSign == Similarity.bandSign(p, i)
  }))

  /** Sanity pin: the SQL planes rule (min p with 2^p ≥ ceil(n/target),
    * else max, clamped by min) reimplemented here must agree with
    * Similarity.planesForCorpus — the same cross-engine guard the band-
    * sign formula carries, covering the corpus sizes the gates run at
    * plus the 2^k boundaries where log2 rounding would drift. */
  require(Seq(1L, 7L, 8L, 9L, 63L, 64L, 65L, 250L, 500L, 2000L, 4096L,
      100000L).forall { n =>
    val needed = if (n == 0) 0L else (n - 1) / 8 + 1
    val sqlPlanes = math.max(4,
      (0 until 16).find(p => (1L << p) >= needed).getOrElse(16))
    sqlPlanes == Similarity.planesForCorpus(n, targetPerBucket = 8,
      minPlanes = 4, maxPlanes = 16)
  })
}
