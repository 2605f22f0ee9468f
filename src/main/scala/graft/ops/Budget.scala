package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Materialize.MaterializeOps

/** Global prefix sums over a totally-ordered corpus — admission budgets
  * ("take documents in id order until the token budget is spent") and
  * sequence packing ("concatenate everything and cut fixed-length
  * training examples"), across ALL sources.
  *
  * The naive form of either is a single running-sum window with no
  * PARTITION BY, which Spark executes on ONE task — a serialization wall
  * at 100 TB (the reason `d_pipeline_prep` windows per source). This
  * operator computes the identical global prefix sum in two parallel
  * stages instead:
  *
  *  1. rows bucket by `id div bucketWidth`; a map-side-combined
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
  * to the naive window (the DuckDB oracles ARE the naive global windows).
  */
object Budget {

  /** The shared parallel prefix sum: every row annotated with `cum` = the
    * inclusive running `weightCol` total in `idCol` order. Ids must be
    * unique, NON-NULL and non-negative (dense helps bucket balance but
    * isn't required). Weights must be NON-NULL and non-negative — a
    * negative weight makes the running total non-monotonic (nonsense for
    * budgets and packing alike), a null id would silently miss the
    * bucket-offset equi-join (row dropped) and a null weight would null
    * the row's `cum` while vanishing from the bucket sums — so ALL three
    * precondition violations fail the job loudly via the same cheap
    * codegen'd branch on the scan, not a separate validation pass.
    */
  def runningTotals(df: DataFrame, idCol: String, weightCol: String,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w0 = col(weightCol).cast("long")
    // guard the CASTED id, not the raw column: a non-numeric string id (or
    // an overflowing decimal) casts to null, which would land in a null
    // bucket, silently miss the offsets equi-join AND corrupt every other
    // bucket's offset (nulls sort first in the offsets window)
    val idl = col(idCol).cast("long")
    val w = when(idl.isNull,
        raise_error(concat(lit(s"runningTotals: null or non-numeric $idCol: "),
          coalesce(col(idCol).cast("string"), lit("null")))))
      .when(w0.isNull, raise_error(concat(
        lit(s"runningTotals: null $weightCol at $idCol="),
        col(idCol).cast("string"))))
      .when(w0 < 0, raise_error(concat(
        lit(s"runningTotals: negative $weightCol at $idCol="),
        col(idCol).cast("string")))).otherwise(w0)
    // integer `div`, not floor(double /): above 2^53 a double quotient
    // loses precision and bucket boundaries drift from the documented width
    val withB = df
      .withColumn("__idl", idl)
      .withColumn("__b", expr(s"__idl div ${bucketWidth}L"))
      .drop("__idl")
      .withColumn("__w", w)
    val bucketSums = withB.groupBy("__b")
      .agg(sum(col("__w")).as("__bsum"))
    // the one sequential step: a running sum over #buckets rows
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    // materialize the bucket-count-row offsets frame: its derivation
    // embeds the WHOLE input subtree, so without this every composed
    // stage re-evaluated its upstream twice (main branch + offsets
    // branch) — exponential in chain depth (d_pipeline_pack re-planned
    // the documents scan 12×, r20 plan audit). Checkpointed, each stage
    // costs upstream twice total and composition is linear.
    val offsets = bucketSums
      .withColumn("__off", coalesce(sum("__bsum").over(wOff), lit(0L)))
      .select("__b", "__off")
      .materialized
    val wIn = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), "__b")
      .withColumn("cum", col("__off") + sum(col("__w")).over(wIn))
      .drop("__b", "__off", "__w")
  }

  /** Admit rows in `idCol` order while the running `weightCol` total stays
    * within `budget`; emits the running total as `cum`.
    */
  def globalRunningBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, bucketWidth: Long = 1L << 20): DataFrame =
    runningTotals(df, idCol, weightCol, bucketWidth)
      .where(col("cum") <= budget)

  /** Concatenate-and-chunk sequence packing: documents laid end-to-end in
    * `idCol` order form one global token stream, cut into fixed
    * `seqLen`-token training examples. Each document gets its stream
    * `offset` (tokens before it), the `chunk` its first token lands in
    * (`offset div seqLen`), and `chunk_pos` (offset within that chunk) —
    * exactly what a loader needs to materialize examples; a document
    * whose tokens straddle a boundary continues into the next chunk, the
    * standard pretraining packing. Same parallel-prefix-sum plan as the
    * budget (the naive form is the same one-task window), so packing a
    * 100 TB corpus stays one bucket shuffle.
    */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
      seqLen: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    runningTotals(df, idCol, weightCol, bucketWidth)
      .withColumn("offset", col("cum") - col(weightCol).cast("long"))
      .withColumn("chunk", expr(s"offset div ${seqLen}L"))
      .withColumn("chunk_pos", col("offset") - col("chunk") * seqLen)
      .drop("cum")
  }

  /** Per-SHARD concatenate-and-chunk packing: documents already assigned
    * to shards (e.g. [[Sampling.epochShards]]) are laid end-to-end in
    * `orderCol` order WITHIN each shard and cut into `seqLen`-token
    * chunks — `chunk` indexes are per-shard. This is the fully parallel
    * packing shape for when global stream order isn't required (an epoch
    * shard maps 1:1 to a loader file anyway): per-shard windows run
    * concurrently with ZERO single-partition stages anywhere in the plan
    * (pinned) — not even the tiny aggregate-fed offsets window
    * [[packSequences]] needs for its global order. Same null/negative
    * weight guards as [[runningTotals]]; `orderCol` must additionally be
    * UNIQUE within each shard ([[Sampling.epochShards]]' `pos` is, by
    * construction) — a tie would make the tied rows' offsets depend on
    * partition delivery order, so it raises instead (a `lag` over the
    * same window sort — no extra exchange).
    */
  def packSequencesSharded(df: DataFrame, shardCol: String, orderCol: String,
      weightCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w0 = col(weightCol).cast("long")
    val w = when(col(shardCol).isNull || col(orderCol).isNull,
        raise_error(lit(s"packSequencesSharded: null $shardCol/$orderCol")))
      .when(w0.isNull || w0 < 0, raise_error(concat(
        lit(s"packSequencesSharded: null or negative $weightCol at $orderCol="),
        col(orderCol).cast("string"))))
      .otherwise(w0)
    val ord = Window.partitionBy(shardCol).orderBy(orderCol)
    val win = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dupe = lag(col(orderCol), 1).over(ord) === col(orderCol)
    df.withColumn("__w", w)
      .withColumn("offset",
        when(dupe, raise_error(concat(
          lit(s"packSequencesSharded: duplicate $orderCol within $shardCol at "),
          col(orderCol).cast("string"))))
        .otherwise(sum(col("__w")).over(win) - col("__w")))
      .withColumn("chunk", expr(s"offset div ${seqLen}L"))
      .withColumn("chunk_pos", col("offset") - col("chunk") * seqLen)
      .drop("__w")
  }

  /** The CHUNK-side view of [[packSequences]] — the materialized packed
    * examples a data loader consumes: one row per (chunk, document) pair
    * with the span of the document inside that chunk, so grouping by
    * `chunk` yields complete training examples without re-deriving any
    * offset. A document straddling chunk boundaries appears once per
    * chunk it occupies:
    *
    *  - `chunk`      — the training-example index (`seqLen` tokens each);
    *  - `doc_offset` — where this span starts INSIDE the document;
    *  - `len`        — span length (per-chunk `len` sums to `seqLen` on
    *    every chunk except the stream's last);
    *  - `chunk_pos`  — where the span starts inside the chunk.
    *
    * Shape: the same parallel-prefix-sum plan as [[packSequences]] plus a
    * partition-local `sequence()`/`explode` over each document's chunk
    * range — NO additional exchange (pinned), and the fan-out per row is
    * ⌈weight/seqLen⌉+1, never corpus-sized. Zero-weight documents occupy
    * no chunk and are dropped.
    */
  /** MATERIALIZED packed training examples: compose a tokenized frame
    * (`idCol`, `token_ids`, `n_tok` — e.g. [[graft.ops.Unigram.tokenIds]]
    * output) with [[packExamples]]' span arithmetic and assemble each
    * chunk's actual `seqLen`-token ID sequence. This is the last hop of
    * the pipeline: what comes out is literally the training batch content
    * (every chunk full at `seqLen` except the stream's last).
    *
    * Shape: the prefix-sum plan of [[packSequences]] (one bucket
    * shuffle), a partition-local span explode (⌈n/seqLen⌉+1 rows per
    * doc), one `slice` per span (no per-token explode — tokens move as
    * array payloads), and a chunk-keyed aggregate whose collect is
    * bounded by `seqLen` tokens per group. No stage is corpus-ordered on
    * a single task.
    */
  def packTokenIds(tok: DataFrame, idCol: String,
      seqLen: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    val spans = packExamples(tok, idCol, "n_tok", seqLen, bucketWidth)
    spans.join(tok.select(col(idCol), col("token_ids")), idCol)
      .select(col("chunk"), col("chunk_pos"),
        slice(col("token_ids"), col("doc_offset").cast("int") + lit(1),
          col("len").cast("int")).as("span"))
      .groupBy("chunk")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("chunk_pos"), col("span")))),
        s => s.getField("span"))).as("token_ids"))
      .withColumn("n_tok", size(col("token_ids")))
  }

  /** Length-bucketed batching card: how much padding does grouping
    * sequences into power-of-two length buckets save over one global
    * batch shape? Standard practice for non-packed fine-tuning batches
    * (pad each batch to its longest member): bucketing by length bounds
    * per-batch padding by the bucket ceiling, so the card reports, per
    * bucket `2^k` (smallest power of two ≥ n_tokens):
    *  - `n_docs`, `sum_tokens` — volume in the bucket;
    *  - `pad_bucket` = n_docs × bucket — tokens if every doc pads to the
    *    bucket ceiling (the bucketed batching upper bound);
    *  - `pad_global` = n_docs × corpus-max — the same docs padded to the
    *    global longest sequence (unbucketed batching's worst case);
    *  - `savings` = 1 − pad_bucket / pad_global.
    *
    * The bucket boundary is integer-only (a ≤-chain over the 2^k
    * literals — no float log2, whose boundary rounding the oracle could
    * disagree with). Token counts must be NON-NULL and ≥ 0 (coalesce
    * upstream; a null count has no length bucket) — violations raise.
    * Counts above `2^maxExp` raise too: a silent clamp would misreport
    * the card's padding math on genuinely long documents.
    *
    * Scale shape: one map-side-combined aggregate over ≤ maxExp+1 bucket
    * keys + a broadcast one-row global max — no corpus-sized shuffle, no
    * window, nothing driver-side.
    */
  def lengthBucketCard(df: DataFrame, nTokensCol: String,
      maxExp: Int = 20): DataFrame = {
    require(maxExp >= 0 && maxExp <= 62, s"maxExp out of range: $maxExp")
    val n = col(nTokensCol)
    val guarded = when(n.isNull || n < 0, raise_error(lit(
        s"Budget.lengthBucketCard: null or negative $nTokensCol — " +
          "coalesce/repair token counts upstream")))
      .otherwise(n.cast("long"))
    val chain = (1 to maxExp).foldLeft(when(guarded <= 1L, lit(1L))) {
      (acc, k) => acc.when(guarded <= (1L << k), lit(1L << k))
    }
    val bucket = chain.otherwise(raise_error(lit(
      s"Budget.lengthBucketCard: $nTokensCol above 2^$maxExp — raise maxExp"))
      .cast("long"))
    val perBucket = df
      .withColumn("__lb_b", bucket)
      .groupBy(col("__lb_b").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nTokensCol).cast("long")).as("sum_tokens"))
    perBucket
      .crossJoin(broadcast(df.agg(max(guarded).as("__lb_gmax"))))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket")).as("pad_bucket"),
        (col("n_docs") * col("__lb_gmax")).as("pad_global"))
      .withColumn("savings", round(lit(1.0) -
        col("pad_bucket").cast("double") / col("pad_global").cast("double"), 6))
  }

  /** [[packTokenIds]] with an EOS document separator — the shape real LM
    * pre-training streams use: each NONEMPTY document's ids are followed
    * by `eosId` before the global concatenate-and-chunk, so examples
    * carry explicit document boundaries (attention resets / loss masking
    * key off them downstream). Empty documents contribute nothing — they
    * have no content to delimit, and an EOS for them would inject
    * boundary tokens whose position depends on upstream filtering.
    * Same two-stage parallel prefix sum; the separator is a row-local
    * append before it.
    */
  def packTokenIdsEos(tok: DataFrame, idCol: String, seqLen: Long,
      eosId: Int, bucketWidth: Long = 1L << 20): DataFrame = {
    val withEos = tok
      .withColumn("token_ids",
        when(size(col("token_ids")) > 0,
          concat(col("token_ids"), array(lit(eosId))))
          .otherwise(col("token_ids")))
      .withColumn("n_tok", size(col("token_ids")))
    packTokenIds(withEos, idCol, seqLen, bucketWidth)
  }

  def packExamples(df: DataFrame, idCol: String, weightCol: String,
      seqLen: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    val packed = packSequences(df, idCol, weightCol, seqLen, bucketWidth)
      .withColumn("__w", col(weightCol).cast("long"))
      .where(col("__w") > 0)
      .withColumn("__last", expr(s"(offset + __w - 1) div ${seqLen}L"))
    packed
      .withColumn("chunk", explode(sequence(col("chunk"), col("__last"))))
      .withColumn("__start", greatest(col("offset"), col("chunk") * seqLen))
      .select(col("chunk"), col(idCol),
        (col("__start") - col("offset")).as("doc_offset"),
        (least(col("offset") + col("__w"), (col("chunk") + 1) * seqLen)
          - col("__start")).as("len"),
        (col("__start") - col("chunk") * seqLen).as("chunk_pos"))
  }
}
