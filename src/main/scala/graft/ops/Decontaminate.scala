package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination for training corpora: find corpus documents
  * that share verbatim n-gram content with an evaluation/benchmark set, so
  * they can be dropped before training (the standard guard against eval
  * leakage).
  *
  * Overlap unit = the same distinct 3-word shingle hashes the dedup
  * operators use ([[graft.functions.TextHashOps]] native kernels), so one
  * scan-side signature serves dedup and decontamination alike.
  *
  * Scale shape: benchmark sets are tiny relative to a 100 TB corpus, so
  * the exploded benchmark shingle table is BROADCAST — corpus shingles
  * stream through a map-side hash join with no corpus-wide shuffle; only
  * the matching (doc, shingle, bench) triples (rare by construction)
  * reach the per-document aggregate. The corpus is never self-joined and
  * never collected.
  */
object Decontaminate {

  /** Per-corpus-document overlap against the benchmark set: `n_shared` =
    * distinct shingle hashes the document shares with ANY benchmark doc,
    * `n_bench` = distinct benchmark docs it collides with. Documents with
    * `n_shared >= minShared` are returned (these are the ones a pipeline
    * would quarantine). Both frames need (`idCol`, `textCol`).
    */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
      out: String) = df.select(
    col(idCol).as(out),
    explode(TextFunctions.shingle_hashes(col(textCol))).as("sh"))

  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    shingled(corpus, idCol, textCol, "cid")
      .join(broadcast(shingled(bench, idCol, textCol, "bid")), "sh")
      .groupBy("cid")
      .agg(countDistinct("sh").as("n_shared"), countDistinct("bid").as("n_bench"))
      .where(col("n_shared") >= minShared)
      .select(col("cid").as(idCol), col("n_shared"), col("n_bench"))
  }

  /** Per-(corpus doc, benchmark doc) ATTRIBUTION of [[overlap]]: which
    * eval item leaked into which document, with the distinct-shingle
    * evidence count — the audit table a decontamination report cites
    * ([[overlap]] aggregates it away to one row per corpus doc). Same
    * scale shape: broadcast bench shingles, corpus streamed once; output
    * is bounded by actual contamination, not the cross product.
    */
  def overlapPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    shingled(corpus, idCol, textCol, "cid")
      .join(broadcast(shingled(bench, idCol, textCol, "bid")), "sh")
      .groupBy("cid", "bid")
      .agg(countDistinct("sh").as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("cid").as(idCol), col("bid").as("bench_id"), col("n_shared"))
  }

  /** SURGICAL span-level decontamination — the GPT-3 appendix-C practice
    * (Brown et al. 2020 split contaminated documents at the overlapping
    * n-grams and kept the clean remainder) instead of [[overlap]]'s
    * whole-document quarantine: every word covered by an n-gram that
    * appears anywhere in the benchmark set is CONTAMINATED; the document
    * is cut at contaminated words and the LONGEST clean fragment (ties →
    * earliest) survives if it has at least `minFragmentWords` words,
    * otherwise the document is dropped (`kept_text` NULL).
    *
    * Semantics (oracle-shared, exact):
    *  - the word stream is the canonical tokenizer stream (lowercased
    *    alnum runs — the same normalization every shingle kernel applies),
    *    so a kept FRAGMENT is re-joined canonical tokens; a document with
    *    NO contamination keeps its RAW text untouched (the fast path —
    *    never rewrite what the gate didn't touch);
    *  - gram↔position correspondence comes from the POSITIONAL hash
    *    kernel (`shingle_hashes_at` — [[graft.functions.TextHashOps]]),
    *    whose values equal the distinct-set kernel's, so the bench set is
    *    the same broadcast [[overlap]] uses;
    *  - NULL text → NULL out; docs shorter than n words carry no grams
    *    and pass clean.
    *
    * Scale shape: the bench gram set is BROADCAST (map-side join — only
    * MATCHING grams reach the contamination-bounded aggregate), matched
    * start positions come back to the corpus through one id-keyed LEFT
    * join, and the split/rebuild is ONE row-local projection whose
    * clean-document branch is a null test (the rare dirty rows pay the
    * per-word fold). The corpus is scanned twice, never self-joined.
    */
  def redactSpans(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minFragmentWords: Int = 10): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minFragmentWords >= 1,
      s"minFragmentWords must be >= 1: $minFragmentWords")
    val benchSh = bench
      .select(explode(TextFunctions.shingle_hashes(col(textCol), n)).as("sh"))
      .distinct()
    val matched = corpus
      .select(col(idCol).as("__rd_id"),
        posexplode(TextFunctions.shingle_hashes_at(col(textCol), n)))
      .withColumnsRenamed(Map("pos" -> "__rd_p", "col" -> "__rd_gh"))
      .join(broadcast(benchSh), col("__rd_gh") === col("sh"))
      .groupBy("__rd_id")
      .agg(array_sort(collect_set(col("__rd_p"))).as("__rd_starts"))
    rebuildSpans(
      corpus.join(matched, col(idCol) === col("__rd_id"), "left"),
      textCol, n, minFragmentWords)
  }

  /** SERVE-TIME form of [[redactSpans]]: the benchmark gram set is FROZEN
    * into a sorted array ([[benchGramSet]]) and membership is a row-local
    * binary search (`matched_starts` — codegen'd), so the whole operator
    * is ONE projection: no join, no aggregate, no shuffle, no state.
    * Identical semantics to the batch form by construction (same
    * positional hashes, same rebuild fold — the fold is literally shared).
    *
    * This is the streaming/online shape — the gate a stream of arriving
    * documents passes through (the `d_dsir_gate` / `d_bm25_served`
    * precedent: freeze the small side once, serve row-locally forever).
    * Benchmark sets are eval suites — thousands of items, not corpora —
    * so the frozen array is broadcast-sized by the same argument as
    * [[overlap]]'s broadcast join.
    */
  def redactSpansServe(corpus: DataFrame, benchSet: Array[Long],
      textCol: String, n: Int = 3, minFragmentWords: Int = 10): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minFragmentWords >= 1,
      s"minFragmentWords must be >= 1: $minFragmentWords")
    val ms = TextFunctions.matched_starts(
      TextFunctions.shingle_hashes_at(col(textCol), n), benchSet)
    // empty match list → NULL starts, so the untouched-document fast path
    // (keep raw text) is the same branch the batch LEFT join produces
    rebuildSpans(
      corpus.withColumn("__rd_starts",
        when(size(ms) === 0, lit(null)).otherwise(ms)),
      textCol, n, minFragmentWords)
  }

  /** The frozen benchmark gram set for [[redactSpansServe]]: sorted
    * distinct shingle hashes, collected driver-side (bench sets are tiny
    * by construction — the same size argument that lets [[overlap]]
    * broadcast them).
    */
  def benchGramSet(bench: DataFrame, textCol: String, n: Int = 3): Array[Long] =
    bench.select(explode(TextFunctions.shingle_hashes(col(textCol), n)).as("sh"))
      .distinct().orderBy("sh")
      .collect().map(_.getLong(0))

  /** Shared split/rebuild projection: expects `__rd_starts` (sorted match
    * start positions, NULL = untouched) and rewrites the text row-locally —
    * the single definition both the batch aggregate path and the frozen-set
    * serve path feed, so their semantics cannot drift.
    */
  private def rebuildSpans(withStarts: DataFrame, textCol: String,
      n: Int, minFragmentWords: Int): DataFrame = {
    val t = col(textCol)
    // the canonical token stream — the same normalization tokenize()
    // applies, so word indexes line up with the positional gram hashes
    val wsExpr = filter(
      split(regexp_replace(lower(t), "[^a-z0-9 ]", " "), " "),
      w => length(w) > 0)
    def dirty(w: Column) = exists(col("__rd_starts"),
      p => p <= w && w <= p + lit(n - 1))
    def f(s: Column, name: String) = s.getField(name)
    val run = aggregate(
      sequence(lit(0), size(col("__rd_ws")) - 1),
      struct(lit(0).as("curS"), lit(0).as("curL"),
        lit(0).as("bestS"), lit(0).as("bestL")),
      (st, w) => when(dirty(w),
          struct((w + 1).as("curS"), lit(0).as("curL"),
            f(st, "bestS").as("bestS"), f(st, "bestL").as("bestL")))
        .otherwise(when(f(st, "curL") + 1 > f(st, "bestL"),
          struct(f(st, "curS").as("curS"), (f(st, "curL") + 1).as("curL"),
            f(st, "curS").as("bestS"), (f(st, "curL") + 1).as("bestL")))
          .otherwise(struct(f(st, "curS").as("curS"), (f(st, "curL") + 1).as("curL"),
            f(st, "bestS").as("bestS"), f(st, "bestL").as("bestL")))))
    withStarts
      .withColumn("__rd_ws", wsExpr)
      .withColumn("__rd_run",
        when(col("__rd_starts").isNull, lit(null)).otherwise(run))
      .withColumn("n_words",
        when(t.isNull, lit(null).cast("int"))
          .otherwise(size(col("__rd_ws")).cast("int")))
      .withColumn("n_dirty_words",
        when(t.isNull, lit(null).cast("int"))
          .when(col("__rd_starts").isNull, lit(0))
          .otherwise(size(filter(sequence(lit(0), size(col("__rd_ws")) - 1),
            dirty(_))).cast("int")))
      .withColumn("kept_words",
        when(t.isNull, lit(null).cast("int"))
          .when(col("__rd_starts").isNull, size(col("__rd_ws")).cast("int"))
          .when(f(col("__rd_run"), "bestL") >= minFragmentWords,
            f(col("__rd_run"), "bestL").cast("int"))
          .otherwise(lit(0)))
      .withColumn("kept_text",
        when(t.isNull, lit(null).cast("string"))
          .when(col("__rd_starts").isNull, t)
          .when(f(col("__rd_run"), "bestL") >= minFragmentWords,
            concat_ws(" ", slice(col("__rd_ws"),
              f(col("__rd_run"), "bestS") + 1, f(col("__rd_run"), "bestL"))))
          .otherwise(lit(null).cast("string")))
      .drop("__rd_id", "__rd_starts", "__rd_ws", "__rd_run")
  }

  /** Containment-RATIO variant of [[overlap]]: flags a corpus document when
    * the FRACTION of its distinct shingles found anywhere in the benchmark
    * set reaches `minRatio` — the right gate for short eval items, where a
    * fixed absolute shingle count either misses short questions (threshold
    * too high) or quarantines long documents for incidental phrase overlap
    * (too low). Same scale shape as [[overlap]]: the distinct benchmark
    * shingle set is broadcast, the corpus streams map-side, and only
    * matching shingles reach the per-document aggregate (per-document
    * shingle totals ride the scan rows — no second corpus pass).
    */
  def containment(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minRatio: Double = 0.5): DataFrame = {
    require(minRatio > 0 && minRatio <= 1, s"minRatio out of (0,1]: $minRatio")
    val corpusSh = corpus.select(
        col(idCol).as("cid"),
        TextFunctions.shingle_hashes(col(textCol)).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("cid"), size(col("shs")).as("n_shingles"),
        explode(col("shs")).as("sh"))
    val benchSh = bench
      .select(explode(TextFunctions.shingle_hashes(col(textCol))).as("sh"))
      .distinct()
    corpusSh.join(broadcast(benchSh), "sh")
      .groupBy("cid", "n_shingles")
      .agg(count(lit(1)).as("n_shared")) // distinct by construction: shs is a set
      .withColumn("containment",
        round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6))
      .where(col("containment") >= minRatio)
      .select(col("cid").as(idCol), col("n_shared"),
        col("n_shingles").cast("int").as("n_shingles"), col("containment"))
  }
}
