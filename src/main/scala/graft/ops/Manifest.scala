package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot manifest — the release artifact of a training-data
  * pipeline. After sampling, budgeting and packing, a dataset release
  * needs a deterministic, order-independent summary a backfill can prove
  * identity against: per (source, shard), the row count, the token sum,
  * and content hashes such that re-materializing the corpus on any
  * cluster layout reproduces the manifest byte-for-byte iff the content
  * is identical.
  *
  * Hash design: per-document fingerprints (the shared rolling word
  * fingerprint, `TextStatsOps`/`OracleFrag.fingerprintExpr` mirror) are
  * combined with BOTH
  *  - `content_xor` — XOR-fold: order-independent, overflow-free, flips
  *    on any single-document change; blind to PAIRS of identical
  *    documents (x ⊕ x = 0), which is exactly what
  *  - `content_mod` — the modular sum (exact DECIMAL accumulation, then
  *    mod 2³¹−1) — catches: duplicate insertions shift the sum.
  * A collision must fool both folds simultaneously.
  *
  * Scale shape: ONE map-side-combined aggregate over a scan-stage
  * projection (the stats kernel + shard hash) — word-count shape, output
  * bounded by sources × shards, no other shuffle, no window. Shards use
  * the [[Sampling.unitHash]] family, so shard membership is a pure
  * function of the id: a backfill of one shard recomputes exactly that
  * shard's row. NULL ids raise (the guard-before-use convention — a NULL
  * shard would silently pool mis-assigned rows); NULL text counts toward
  * `n_docs` but contributes no tokens or content (documented NULL-skip,
  * mirrored by the oracle's aggregate NULL semantics).
  */
object Manifest {

  /** The scan-stage projection under the manifest: `shard` (pure function
    * of the id), `__fp` (per-document fingerprint) and `__tok` (whitespace
    * token count). Shared verbatim by the batch [[snapshot]] and the
    * streaming twin (`DocumentStream.runningManifest`) so the two can't
    * drift — the per-document values are computed by the SAME expressions;
    * only the fold differs (one aggregate vs a per-key running state).
    */
  def fingerprinted(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val st = graft.functions.TextFunctions.text_stats(col(textCol))
    val guarded: Column = when(col(idCol).isNull, raise_error(lit(
        s"Manifest.snapshot: null $idCol — shard assignment needs a " +
          "non-null id; filter or repair ids upstream")))
      .otherwise(col(idCol))
    docs
      .withColumn("shard",
        pmod(Sampling.unitHash(guarded), lit(nShards.toLong)).cast("int"))
      .withColumn("__fp", st.getField("fingerprint"))
      .withColumn("__tok", st.getField("nTokensWs"))
  }

  /** Per-(source, shard) manifest: `(source, shard, n_docs, n_tokens,
    * content_xor, content_mod)`.
    */
  def snapshot(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, nShards: Int): DataFrame = {
    fingerprinted(docs, sourceCol, idCol, textCol, nShards)
      .groupBy(col(sourceCol), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok").cast("long")).as("n_tokens"),
        bit_xor(col("__fp")).as("content_xor"),
        // exact DECIMAL accumulation (fingerprints < 2³¹, so 38 digits
        // hold any corpus), folded back to a long AFTER the sum — Spark's
        // long sum would wrap silently at ~4·10¹⁸ total
        (sum(col("__fp").cast("decimal(38,0)")) % lit(2147483647L))
          .cast("long").as("content_mod"))
  }

  /** Incremental manifest UPDATE — append a batch to a released manifest
    * WITHOUT rescanning the accumulated corpus: every [[snapshot]] fold is
    * commutative and associative (count, sum, XOR, modular sum), so
    * `combine(snapshot(A), snapshot(B)) = snapshot(A ∪ B)` exactly — the
    * algebra the oracle row pins by recomputing the full corpus. The same
    * property powers the streaming twin's per-key running state; this is
    * its batch form for the daily-increment release.
    *
    * Inputs must be disjoint corpora (ids are identity — run
    * [[graft.ops.Dedup.dedupIncremental]] first if a batch can re-carry
    * released ids; double-counted documents are exactly what the
    * [[verify]] diff would then catch). NULL hash cells (all-NULL-text
    * groups) combine by the aggregates' NULL-skip rule, matching what a
    * full recompute produces.
    *
    * Scale shape: one full-outer join of two shards-sized tables.
    */
  def combine(released: DataFrame, increment: DataFrame,
      sourceCol: String): DataFrame = {
    val a = released.withColumnsRenamed(Map("n_docs" -> "a_docs",
      "n_tokens" -> "a_tok", "content_xor" -> "a_xor", "content_mod" -> "a_mod"))
    val b = increment.withColumnsRenamed(Map("n_docs" -> "b_docs",
      "n_tokens" -> "b_tok", "content_xor" -> "b_xor", "content_mod" -> "b_mod"))
    a.join(b, Seq(sourceCol, "shard"), "full_outer")
      .select(col(sourceCol), col("shard"),
        (coalesce(col("a_docs"), lit(0L)) + coalesce(col("b_docs"), lit(0L)))
          .as("n_docs"),
        // NULL-skip semantics of SUM: null + value = value, null + null = null
        when(col("a_tok").isNull && col("b_tok").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("a_tok"), lit(0L)) + coalesce(col("b_tok"), lit(0L)))
          .as("n_tokens"),
        when(col("a_xor").isNull && col("b_xor").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("a_xor"), lit(0L))
            .bitwiseXOR(coalesce(col("b_xor"), lit(0L)))).as("content_xor"),
        when(col("a_mod").isNull && col("b_mod").isNull, lit(null).cast("long"))
          .otherwise(pmod(coalesce(col("a_mod"), lit(0L))
            + coalesce(col("b_mod"), lit(0L)), lit(2147483647L))).as("content_mod"))
  }

  /** Backfill VERIFICATION — the consumer of [[snapshot]]: recompute the
    * manifest over a re-materialized corpus and diff it against the
    * released manifest, per (source, shard). This is what makes the
    * manifest a release artifact rather than a report: "the backfill is
    * byte-identical" becomes one join over two shard-count-sized tables.
    *
    * Emits every (source, shard) of either side with a `status`:
    * `ok` (all four cells agree), `mismatch` (both sides present,
    * something differs — `tokens_ok`/`content_ok` say what), `missing`
    * (released but absent from the probe), `unexpected` (present in the
    * probe only). Comparisons are null-safe (`<=>`): an all-NULL-text
    * shard agreeing on NULL hashes is `ok`, not a false mismatch.
    *
    * Scale shape: two [[snapshot]] aggregates (one corpus scan each) and
    * one join of sources × shards rows — the corpora themselves are never
    * joined. Because a shard is a pure function of the id, verifying a
    * SUBSET of shards only needs the probe filtered to those shards.
    */
  def verify(probe: DataFrame, released: DataFrame, sourceCol: String,
      idCol: String, textCol: String, nShards: Int): DataFrame = {
    val got = snapshot(probe, sourceCol, idCol, textCol, nShards)
      .withColumnsRenamed(Map("n_docs" -> "g_docs", "n_tokens" -> "g_tok",
        "content_xor" -> "g_xor", "content_mod" -> "g_mod"))
    val want = released
      .withColumnsRenamed(Map("n_docs" -> "w_docs", "n_tokens" -> "w_tok",
        "content_xor" -> "w_xor", "content_mod" -> "w_mod"))
    got.join(want, Seq(sourceCol, "shard"), "full_outer")
      .select(col(sourceCol), col("shard"),
        when(col("w_docs").isNull, lit("unexpected"))
          .when(col("g_docs").isNull, lit("missing"))
          .when(col("g_docs") === col("w_docs") &&
            (col("g_tok") <=> col("w_tok")) &&
            (col("g_xor") <=> col("w_xor")) &&
            (col("g_mod") <=> col("w_mod")), lit("ok"))
          .otherwise(lit("mismatch")).as("status"),
        col("g_docs").as("n_docs_got"), col("w_docs").as("n_docs_want"),
        (col("g_tok") <=> col("w_tok")).as("tokens_ok"),
        ((col("g_xor") <=> col("w_xor")) && (col("g_mod") <=> col("w_mod")))
          .as("content_ok"))
  }
}
