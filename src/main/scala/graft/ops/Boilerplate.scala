package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate line removal — the C4-style cleanup stage
  * (Raffel et al. 2020 removed lines duplicated across the corpus;
  * CCNet/RefinedWeb run the same shape) that strips navigation chrome,
  * cookie banners and template footers: any LINE that appears in at least
  * `minDocs` distinct documents is deleted from every document, order of
  * the surviving lines preserved.
  *
  * Semantics (oracle-shared, exact):
  *  - a "line" is a maximal '\n'-free run of the raw text — no trimming,
  *    no normalization, so the frequency key is the exact byte sequence;
  *  - EMPTY lines are excluded from frequency counting and therefore never
  *    removed (blank separators are structure, not boilerplate);
  *  - frequency is DOCUMENT frequency (`countDistinct(id)`) — a line
  *    repeated 50× inside one spammy document is repetition
  *    ([[TextAnalysis.repetitionSignals]]'s job), not boilerplate;
  *  - NULL text stays NULL (clean text and counts), the engine's
  *    NULL-in/NULL-out convention for scalar transforms.
  *
  * Scale shape — two complementary physical forms, same result (parity
  * pinned in OpsSpec, both oracle-gated):
  *
  *  1. [[clean]] (broadcast-set form): pass 1 aggregates the frequent-line
  *     set (line-keyed, map-side combined, output bounded by
  *     totalLines/minDocs); pass 2 packs it into ONE row and
  *     broadcast-cross-joins it back, so line removal is a scan-stage
  *     array filter — the corpus is never shuffled at all. The right form
  *     when the frequent set fits an executor (guarded by
  *     `maxFreqLines`, raise-not-truncate). Note the per-line membership
  *     probe is a linear scan of the broadcast array (Catalyst arrays have
  *     no hash probe), so this form's cost is lines × |freq| — fine for
  *     the template-chrome regime (|freq| in the hundreds/thousands).
  *  2. [[cleanViaJoin]] (join form): explode lines once, LEFT-join the
  *     (broadcast) frequent set — hash probe, O(1) per line — and regroup
  *     by document, restoring order from the captured line position. One
  *     doc-keyed shuffle of the line stream; the form that survives a
  *     frequent set too large to probe linearly.
  *
  * At 100 TB: pass 1 is the same shape as a word count (shuffle keyed by
  * line, partial aggregation map-side); neither form ever builds an
  * all-pairs structure, and the document side is touched exactly twice.
  */
object Boilerplate {

  /** Lines of a text column: split on '\n', no trimming. */
  def lines(text: Column): Column = split(text, "\n", -1)

  /** Null ids RAISE (the guard-before-use convention shared with the
    * samplers): a NULL id would silently vanish from `countDistinct`
    * document frequency — under-counting every line the document
    * contributes — and can never match the join form's regroup-restore
    * join, so a non-null text would come back with a NULL clean column
    * (silent data loss). Ids must also be UNIQUE for the join form (one
    * document = one regroup); duplicates are detected and raised in
    * [[cleanViaJoinKeyed]] itself, where the regroup can see them.
    */
  private def guardedId(idCol: String): Column =
    when(col(idCol).isNull, raise_error(lit(
      s"Boilerplate: null $idCol — document frequency and line regrouping " +
        "need a non-null unique document id; filter or repair ids upstream")))
      .otherwise(col(idCol))

  /** The frequent-line table `(line, line_df)`: every non-empty line
    * appearing in at least `minDocs` DISTINCT documents. One line-keyed
    * aggregate; output is bounded by totalLines/minDocs regardless of
    * corpus size.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    docs.select(guardedId(idCol).as("__bl_id"),
        explode(lines(col(textCol))).as("line"))
      .where(length(col("line")) > 0)
      .groupBy("line")
      .agg(countDistinct(col("__bl_id")).as("line_df"))
      .where(col("line_df") >= minDocs)
  }

  /** Broadcast-set removal: adds `outCol` (text with frequent lines
    * deleted) and `n_lines_removed` (INT). Zero shuffles on the document
    * side — the frequent set is aggregated to one row and broadcast; the
    * filter runs in the scan stage. Raises (rather than truncating) if the
    * frequent set exceeds `maxFreqLines`, the signal to switch to
    * [[cleanViaJoin]].
    */
  def clean(docs: DataFrame, idCol: String, textCol: String, minDocs: Long,
      maxFreqLines: Long = 1L << 20, outCol: String = "text_clean"): DataFrame =
    cleanAgainstIndex(docs, frequentLines(docs, idCol, textCol, minDocs),
      textCol, maxFreqLines, outCol)

  /** [[clean]] against a PRECOMPUTED frequent-line index (a frame with a
    * `line` column) — the streaming-compatible half: the index is a static
    * batch side, the document side is stateless per-row, so the identical
    * transform runs under `readStream` (StreamingSpec pins parity).
    */
  def cleanAgainstIndex(docs: DataFrame, freq: DataFrame, textCol: String,
      maxFreqLines: Long = 1L << 20, outCol: String = "text_clean"): DataFrame = {
    // one row: the frequent-line set + its size, guarded BEFORE use so an
    // oversized set raises in the aggregate, never silently mis-cleans
    val packed = freq.agg(count(lit(1)).as("__bl_n"),
      collect_list(col("line")).as("__bl_set"))
    val guarded = packed.select(
      when(col("__bl_n") > maxFreqLines, raise_error(concat(
          lit(s"Boilerplate.clean: frequent-line set exceeds maxFreqLines=$maxFreqLines (found "),
          col("__bl_n"), lit(") — use cleanViaJoin"))))
        .otherwise(col("__bl_set")).as("__bl_set"))
    val t = col(textCol)
    docs.crossJoin(broadcast(guarded))
      .withColumn("__bl_kept",
        filter(lines(t), l => !array_contains(col("__bl_set"), l)))
      .withColumn(outCol,
        when(t.isNull, lit(null).cast("string"))
          .otherwise(concat_ws("\n", col("__bl_kept"))))
      .withColumn("n_lines_removed",
        when(t.isNull, lit(null).cast("int"))
          .otherwise((size(lines(t)) - size(col("__bl_kept"))).cast("int")))
      .drop("__bl_set", "__bl_kept")
  }

  /** Join-form removal, result-identical to [[clean]]: explode lines with
    * their position, LEFT-join the (broadcast) frequent set, regroup per
    * document sorting survivors by position. The general form — hash-probe
    * membership, no broadcast-array linear scan — at the cost of one
    * doc-keyed shuffle of the line stream.
    */
  def cleanViaJoin(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long, outCol: String = "text_clean"): DataFrame =
    cleanViaJoinKeyed(docs,
      frequentLines(docs, idCol, textCol, minDocs), Nil, idCol, textCol,
      outCol)

  /** PER-STRATUM frequent lines — the per-DOMAIN granularity
    * (RefinedWeb-style: a nav bar is boilerplate on ITS site, not
    * globally): `(strata, line, line_df)` with document frequency counted
    * within each stratum. Same single aggregate, keyed by (stratum, line).
    */
  def frequentLinesBy(docs: DataFrame, strataCol: String, idCol: String,
      textCol: String, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    docs.select(col(strataCol), guardedId(idCol).as("__bl_id"),
        explode(lines(col(textCol))).as("line"))
      .where(length(col("line")) > 0)
      .groupBy(col(strataCol), col("line"))
      .agg(countDistinct(col("__bl_id")).as("line_df"))
      .where(col("line_df") >= minDocs)
  }

  /** Per-stratum removal: a line is deleted from a document only when it
    * is frequent WITHIN that document's stratum. A line frequent globally
    * but rare inside every source (an aggregator artifact) survives here
    * and falls to [[clean]] — the two scopes are complementary gates.
    */
  def cleanViaJoinBy(docs: DataFrame, strataCol: String, idCol: String,
      textCol: String, minDocs: Long,
      outCol: String = "text_clean"): DataFrame =
    cleanViaJoinKeyed(docs,
      frequentLinesBy(docs, strataCol, idCol, textCol, minDocs),
      Seq(strataCol), idCol, textCol, outCol)

  /** Shared join-form core: LEFT-join exploded lines against `freq` on
    * (extraKeys :+ line), regroup per document restoring order. One
    * definition for the global and per-stratum scopes. The stratum keys
    * join NULL-SAFE (`<=>`) — a NULL stratum is a legal group whose
    * frequent lines must still be cut (the round-9 sampler lesson);
    * `line` itself can never be NULL (split yields no null elements).
    * Ids are guarded: NULL ids raise on the scan ([[guardedId]] — a NULL
    * regroup key never re-joins, so the doc's clean text would silently
    * come back NULL), and DUPLICATE ids raise in the regroup — two
    * documents sharing an id would interleave their lines into one
    * rebuilt text. Duplicates are detected as >1 position-0 line per
    * group (every non-NULL-text document explodes exactly one), which
    * costs one conditional sum — no countDistinct expansion.
    */
  private def cleanViaJoinKeyed(docs: DataFrame, freq: DataFrame,
      extraKeys: Seq[String], idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val freqFlag = freq.select(
      extraKeys.map(k => col(k).as(s"__bl_r_$k")) ++
        Seq(col("line").as("__bl_r_line"), lit(1).as("__bl_hit")): _*)
    val exploded = docs
      .select((extraKeys.map(col) :+ guardedId(idCol).as("__bl_id")) :+
        posexplode(lines(col(textCol))).as(Seq("__bl_pos", "line")): _*)
    val joinCond = extraKeys
      .map(k => col(k) <=> col(s"__bl_r_$k"))
      .foldLeft(col("line") === col("__bl_r_line"))(_ && _)
    val flagged = exploded.join(broadcast(freqFlag), joinCond, "left")
    regroupLines(flagged, col("__bl_hit").isNull, docs, idCol, textCol, outCol)
  }

  /** Shared order-restoring regroup of a marked line stream (`__bl_id`,
    * `__bl_pos`, `line`, + the keep condition's inputs): keep the lines
    * satisfying `keepCond`, rebuild each document in position order, count
    * the cut lines, raise on duplicate ids (>1 position-0 line per group),
    * and restore NULL-text documents (which explode to zero rows) as
    * NULL-out. ONE definition under the corpus-frequency cut and the
    * within-document dedup, so the regroup invariants cannot drift.
    */
  private def regroupLines(marked: DataFrame, keepCond: Column,
      docs: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val rebuilt = marked.groupBy(col("__bl_id"))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(when(keepCond,
            struct(col("__bl_pos"), col("line"))))),
          s => s.getField("line"))).as("__bl_clean"),
        sum(when(keepCond, 0L).otherwise(1L))
          .cast("int").as("__bl_removed"),
        sum(when(col("__bl_pos") === 0, 1L).otherwise(0L)).as("__bl_docs"))
      .select(col("__bl_id"),
        when(col("__bl_docs") > 1, raise_error(concat(
            lit(s"Boilerplate: duplicate $idCol "), col("__bl_id").cast("string"),
            lit(" — line regrouping needs unique document ids"))))
          .otherwise(col("__bl_clean")).as("__bl_clean"),
        col("__bl_removed"))
    // docs with NULL text explode to zero rows — restore them (NULL out)
    docs.join(rebuilt, col(idCol) === col("__bl_id"), "left")
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(col("__bl_clean")))
      .withColumn("n_lines_removed",
        when(col(textCol).isNull, lit(null).cast("int"))
          .otherwise(col("__bl_removed")))
      .drop("__bl_id", "__bl_clean", "__bl_removed")
  }

  /** WITHIN-document duplicate-line removal — the cleaner counterpart of
    * [[TextAnalysis.lineRepetition]]'s stats (Gopher-style repetition
    * REMOVAL: scraper loops, chat-log spam, repeated nav chrome inside one
    * page). Keeps the FIRST occurrence of every repeated line, preserving
    * document order; EMPTY lines are structure and are never deduplicated
    * (repeated blank separators survive). NULL text stays NULL; NULL ids
    * raise and duplicate ids raise in the regroup (the [[clean]] family's
    * guard conventions).
    *
    * Scale shape: one (id, line)-keyed window to rank occurrences + the
    * shared doc-keyed regroup — two shuffles of the line stream, no
    * corpus-level aggregate at all (the cut is per-document, so unlike
    * [[clean]] there is no frequency table to build or broadcast). The
    * row-local alternative (first-occurrence filter via array membership)
    * is O(lines²) per document — this form stays O(lines log lines) for
    * the pathological many-line documents that are exactly the ones
    * needing the cleanup.
    */
  def dedupLinesWithin(docs: DataFrame, idCol: String, textCol: String,
      outCol: String = "text_clean"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = docs
      .select(guardedId(idCol).as("__bl_id"),
        posexplode(lines(col(textCol))).as(Seq("__bl_pos", "line")))
    val w = Window.partitionBy(col("__bl_id"), col("line"))
      .orderBy(col("__bl_pos"))
    val marked = exploded.withColumn("__bl_rn", row_number().over(w))
    regroupLines(marked, col("__bl_rn") === 1 || col("line") === "",
      docs, idCol, textCol, outCol)
  }

  /** CORPUS-WIDE first-occurrence line dedup — the paragraph-level exact
    * dedup stage of CCNet (Wenzek et al. 2020 dedupe paragraphs across the
    * whole crawl shard before LM filtering): every non-empty line keeps
    * only its FIRST occurrence corpus-wide — the smallest `(doc_id, pos)`
    * holding it — and every later occurrence in ANY document (including
    * repeats inside the first document itself) is removed. Empty lines
    * are structure and always survive; NULL text stays NULL; NULL and
    * duplicate ids raise ([[clean]]'s guard conventions).
    *
    * Contrast the two corpus-scope cuts: [[clean]] deletes a frequent line
    * from EVERY document (boilerplate is noise wherever it appears, at a
    * df threshold); this keeps exactly one copy of every line, at df 1
    * (duplicated content is signal once, noise twice — the CCNet stance
    * for training corpora). Composing it subsumes [[dedupLinesWithin]]
    * (a within-doc repeat is a later occurrence by definition).
    *
    * Scale shape: the first-occurrence table is ONE line-keyed aggregate —
    * a lexicographic `min(struct(id, pos))`, partial-combined map-side, so
    * a hub line (chrome on 10⁸ pages) reduces per map task before the
    * shuffle (the exactDedup min_by rule); then one line-keyed LEFT join
    * of the line stream against that distinct-line-sized table (never
    * broadcast-forced — at corpus scale it IS corpus-sized; Catalyst picks
    * by stats) and the shared doc-keyed regroup. No all-pairs structure,
    * three shuffles total, each keyed by line or doc.
    */
  def dedupLinesAcross(docs: DataFrame, idCol: String, textCol: String,
      outCol: String = "text_clean"): DataFrame = {
    val exploded = docs
      .select(guardedId(idCol).as("__bl_id"),
        posexplode(lines(col(textCol))).as(Seq("__bl_pos", "line")))
    val firstOcc = exploded.where(length(col("line")) > 0)
      .groupBy("line")
      .agg(min(struct(col("__bl_id").as("id"), col("__bl_pos").as("pos")))
        .as("__bl_first"))
      .select(col("line").as("__bl_f_line"),
        col("__bl_first").getField("id").as("__bl_f_id"),
        col("__bl_first").getField("pos").as("__bl_f_pos"))
    val marked = exploded
      .join(firstOcc, col("line") === col("__bl_f_line"), "left")
    regroupLines(marked,
      col("__bl_f_id").isNull ||
        (col("__bl_id") === col("__bl_f_id") &&
          col("__bl_pos") === col("__bl_f_pos")),
      docs, idCol, textCol, outCol)
  }

  /** Row-local regime of [[dedupLinesWithin]] — identical result (parity
    * pinned in OpsSpec) computed inside ONE projection: a line survives iff
    * it is empty or its FIRST index in the document's line array is its own
    * (`array_position`, 1-based, against the 0-based filter index). Zero
    * exchanges, no ids needed (nothing regroups, so the null/duplicate-id
    * guards of the shuffle form are moot here), which also makes it the
    * stateless STREAMING twin. The membership probe is O(L) per line —
    * O(L²) per document — so this is the bounded-line-count regime (page
    * chrome, chat transcripts); the window+regroup form is the many-line
    * escape, exactly the [[clean]]-vs-[[cleanViaJoin]] pairing one level
    * down.
    */
  def dedupLinesWithinLocal(docs: DataFrame, textCol: String,
      outCol: String = "text_clean"): DataFrame = {
    val kept = expr("filter(__bl_ls, (__l, __i) -> " +
      "__l = '' OR array_position(__bl_ls, __l) = __i + 1)")
    docs.withColumn("__bl_ls", lines(col(textCol)))
      .withColumn("__bl_keep", kept)
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws("\n", col("__bl_keep"))))
      .withColumn("n_lines_removed",
        when(col(textCol).isNull, lit(null).cast("int"))
          .otherwise((size(col("__bl_ls")) - size(col("__bl_keep"))).cast("int")))
      .drop("__bl_ls", "__bl_keep")
  }
}
