package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE tokenizer TRAINING — the standard pretraining-pipeline
  * stage that turns raw text into a merge table (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — public
  * algorithm, reference-free implementation).
  *
  * Algorithm: words start as character sequences; each round counts all
  * adjacent symbol pairs weighted by word frequency, merges the most
  * frequent pair everywhere (ties broken lexicographically, so training
  * is fully deterministic), and repeats. The merge table IS the
  * tokenizer: encoding a word applies the merges in rank order.
  *
  * Scale shape (the part that matters at 100 TB): pair counting runs on
  * the DISTINCT-WORD table, not the corpus — one `explode(words)` +
  * map-side-combined `groupBy(word).count()` collapses the corpus to its
  * vocabulary (~10⁷ rows for a web-scale crawl) before any BPE work
  * begins, and each merge round is then one pair-keyed shuffle of
  * vocabulary-sized data plus a LIMIT-1 argmax (a tiny aggregate; the
  * only thing that ever reaches the driver is the single winning pair,
  * which re-enters the plan as a literal — the broadcast pattern).
  * Segmentations are symbol strings where EVERY symbol owns its own
  * leading and trailing space (" a  n  a " — two spaces between
  * neighbors), so a merge is one codegen'd
  * `replace(seg, " l  r ", " lr ")`. The unit-owned spaces are what make
  * a single left-to-right replace EXACTLY greedy BPE: adjacent pair
  * occurrences share no characters, so consuming one cannot destroy the
  * next ("banana" under (a,n) merges BOTH occurrences). A shared-space
  * encoding (" a n a n a " with the pattern " a n ") silently skips the
  * second of two adjacent occurrences, because the first match eats the
  * space the second needs. The DuckDB oracle replays the identical
  * string algebra. `localCheckpoint` per round keeps the plan flat
  * across rounds (the star-CC pattern).
  */
object Bpe {

  /** One trained merge: at `rank`, symbols `lhs`+`rhs` fused; `pairCount`
    * is the weighted adjacency count that won the round.
    */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long)

  /** Initial segmentation of a word with unit-owned spaces:
    * "abc" → " a  b  c " (each char wrapped as " c "). Every symbol —
    * including the first and last — is matchable as " sym ", and
    * NEIGHBORING pair occurrences share no characters (see the object
    * scaladoc), which is what lets a merge be one plain string replace.
    */
  private def initSeg(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** Symbol list of a segmentation string: split on single spaces and
    * drop the empties the double separators produce.
    */
  private val symsSql = "filter(split(trim(seg), ' '), __f -> length(__f) > 0)"

  /** Adjacent (l, r) symbol pairs of a BOUND symbol-array column. The
    * caller materializes the array once (`__syms`) before this transform:
    * inlining [[symsSql]] here would re-run trim/split/filter inside the
    * per-element lambda (`element_at`), making pair extraction O(L²) per
    * word per round — HOF lambdas get no common-subexpression elimination.
    */
  private def pairCol(s: String): Column =
    expr(s"transform(slice($s, 1, greatest(size($s) - 1, 0)), " +
      s"(__x, __i) -> struct(__x AS l, element_at($s, __i + 2) AS r))")

  /** Apply one merge to a segmentation string. `replace` scans left to
    * right and never rescans replaced output — and because units own
    * their spaces, that is exactly BPE's greedy non-overlapping pass:
    * " a  a  a " under (a,a) → " aa  a ", " b  a  n  a  n  a " under
    * (a,n) → " b  an  an  a " (both occurrences merge).
    */
  private def applyMerge(seg: Column, m: Merge): Column =
    applyPair(seg, m.lhs, m.rhs)

  private def applyPair(seg: Column, lhs: String, rhs: String): Column =
    replace(seg, lit(s" $lhs  $rhs "), lit(s" $lhs$rhs "))

  /** Train `numMerges` BPE merges over `textCol`, tokenized with the same
    * normalization as [[TextAnalysis.words]]. Deterministic: the argmax
    * orders by (count DESC, l ASC, r ASC). Raises if the vocabulary runs
    * out of adjacent pairs before `numMerges` rounds (ask for fewer
    * merges than the corpus can support).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] =
    trainRounds(docs, textCol, numMerges, "BPE",
      pick = { (seg, r) =>
        val top = seg.withColumn("__syms", expr(symsSql))
          .select(col("cnt"), explode(pairCol("__syms")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("cnt").as("c"))
          .orderBy(desc("c"), asc("l"), asc("r"))
          .limit(1).collect()
        top.headOption.map(h => Merge(r, h.getString(0), h.getString(1), h.getLong(2)))
      },
      pairOf = (m: Merge) => (m.lhs, m.rhs))

  /** Shared round scaffold of [[train]] and [[trainWordPiece]]: distinct-
    * word collapse, unit-owned-space init segmentation, and the per-round
    * argmax-collect → merge-replace → checkpoint loop. ONE definition —
    * the two trainers differ ONLY in `pick`'s argmax — so loop fixes
    * (checkpoint strategy, the no-pairs-left raise) cannot drift.
    */
  private def trainRounds[M](docs: DataFrame, textCol: String,
      numMerges: Int, name: String, pick: (DataFrame, Int) => Option[M],
      pairOf: M => (String, String)): Seq[M] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val words = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var seg = words.select(col("w"), col("cnt"), initSeg(col("w")).as("seg"))
      .localCheckpoint()
    val merges = Seq.newBuilder[M]
    for (r <- 1 to numMerges) {
      val m = pick(seg, r)
      require(m.nonEmpty, s"$name: no adjacent pairs left at round $r")
      merges += m.get
      val (l, rr) = pairOf(m.get)
      seg = seg.withColumn("seg", applyPair(col("seg"), l, rr)).localCheckpoint()
    }
    merges.result()
  }

  /** Segmentation of a word under a trained merge table: initial chars,
    * then every merge applied in rank order — `merges.size` chained
    * codegen'd replaces, one projection.
    */
  def segmentWithMerges(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(initSeg(word))(applyMerge)

  /** One trained WordPiece-style merge: the likelihood-scored variant,
    * with the symbol counts that formed its score kept for audit (the
    * emitted table is integer-only; see [[trainWordPiece]]).
    */
  final case class WpMerge(rank: Int, lhs: String, rhs: String,
      pairCount: Long, leftCount: Long, rightCount: Long)

  /** WordPiece-style tokenizer TRAINING (Schuster & Nakajima 2012; the
    * BERT tokenizer family — public algorithm, reference-free): identical
    * machinery to [[train]] except the per-round argmax maximizes the
    * LIKELIHOOD GAIN `count(l,r) / (count(l) · count(r))` instead of raw
    * pair frequency — the pair that is frequent TOGETHER relative to how
    * frequent its parts are. A corpus of very common characters stops
    * winning on raw adjacency; cohesive rare units merge first (pinned in
    * OpsSpec against a fixture where the two trainers pick different
    * first merges). Continuation markers ("##") are a vocabulary-EXPORT
    * rendering; the score is what distinguishes the training dynamics.
    *
    * Determinism across engines: the score is compared as an IEEE double
    * `c / (cl·cr)` from exact integer counts, and BOTH engines evaluate
    * the identical expression on identical inputs — the argmax is always
    * bit-reproducible Spark-vs-DuckDB. While `cl·cr ≤ 2⁵³` (counts to
    * ~9·10¹⁵ products — any vocabulary a single tokenizer run trains on),
    * the stronger property also holds: every step is correctly rounded
    * and monotone, so the double order cannot contradict the exact
    * rational order — near-equal scores only collapse to exact double
    * equality, where the (l, r) lexicographic tie-break decides. Beyond
    * 2⁵³ the product itself rounds and two scores within ~2⁻⁵⁰ relative
    * may order arbitrarily (still deterministically, and identically in
    * both engines). The emitted table itself is integer-only
    * (pair/left/right counts).
    *
    * Scale shape: same as [[train]] — everything runs on the
    * vocabulary-sized distinct-word table ([[trainRounds]] is literally
    * the shared loop); each round adds one symbol-keyed count aggregate
    * (map-side combined) and two broadcast joins of that
    * ≤vocabulary-sized count table into the pair argmax.
    */
  def trainWordPiece(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[WpMerge] =
    trainRounds(docs, textCol, numMerges, "WordPiece",
      pick = { (seg, r) =>
        val withSyms = seg.withColumn("__syms", expr(symsSql))
        val symCounts = withSyms
          .select(col("cnt"), explode(col("__syms")).as("sym"))
          .groupBy("sym").agg(sum("cnt").as("sc"))
        val top = withSyms
          .select(col("cnt"), explode(pairCol("__syms")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("cnt").as("c"))
          .join(broadcast(symCounts.select(col("sym").as("l"), col("sc").as("cl"))), Seq("l"))
          .join(broadcast(symCounts.select(col("sym").as("r"), col("sc").as("cr"))), Seq("r"))
          .orderBy(
            (col("c").cast("double") / (col("cl").cast("double") * col("cr").cast("double"))).desc,
            asc("l"), asc("r"))
          .limit(1).select("l", "r", "c", "cl", "cr").collect()
        top.headOption.map(h => WpMerge(r, h.getString(0), h.getString(1),
          h.getLong(2), h.getLong(3), h.getLong(4)))
      },
      pairOf = (m: WpMerge) => (m.lhs, m.rhs))

  /** [[tokenCounts]] under a trained WordPiece merge table — the merge
    * application is the identical unit-owned-space replace, so the BPE
    * machinery segments both tokenizers.
    */
  def tokenCountsWordPiece(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[WpMerge]): DataFrame =
    tokenCounts(docs, textCol, idCol,
      merges.map(m => Merge(m.rank, m.lhs, m.rhs, m.pairCount)))

  /** Per-document token counts under the TRAINED tokenizer, next to the
    * closed-form [[TextAnalysis.tokenEstimate]] — the "is the estimate
    * honest?" comparison row. One explode + map-side-combined sum; the
    * merge table rides in the plan as literals (broadcast-equivalent).
    * Documents with ZERO tokenizable words (null/empty/punctuation-only
    * text) are kept with `n_tok_trained = 0` — the explode contracts them
    * away, so the aggregate is re-joined against the id set; silently
    * dropping rows would make per-corpus token sums lie.
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val perWord = docs
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("seg", segmentWithMerges(col("w"), merges))
      .withColumn("n", expr(s"size($symsSql)"))
    val counts = perWord.groupBy(col(idCol))
      .agg(sum(col("n").cast("long")).as("__n_tok"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n_tok"), lit(0L)).as("n_tok_trained"))
  }
}
