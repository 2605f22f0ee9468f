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
      pick = (v, r) => v.bestByCount().map { case (l, rr, c) => Merge(r, l, rr, c) },
      pairOf = (m: Merge) => (m.lhs, m.rhs))

  /** Shared round scaffold of [[train]] and [[trainWordPiece]]: ONE Spark
    * job collapses the corpus to its distinct-word count table (the only
    * corpus-sized work BPE training has), then the merge loop runs
    * DRIVER-LOCAL over that vocabulary — the two trainers differ ONLY in
    * `pick`'s argmax, so loop fixes cannot drift.
    *
    * Why driver-local (VERDICT r10 §wrong-2): the word table is
    * vocabulary-sized BY CONSTRUCTION (~10⁷ rows for a web-scale crawl —
    * the same order as the codebooks and centroid tables this repo already
    * collects), but the previous in-plan loop paid one argmax JOB plus one
    * checkpoint per merge round — a production 32k-merge vocabulary means
    * 32k sequential scheduler round-trips of pure overhead on
    * vocabulary-sized data. Collected once, the loop is plain Scala with
    * IDENTICAL arithmetic (exact integer pair/symbol counts, the same
    * (count DESC, l, r) argmax with UTF-8-byte string order — Spark's
    * UTF8String and DuckDB's memcmp collation — and the same greedy
    * non-overlapping merge pass the unit-owned-space replace performs), so
    * the oracle-gated merge tables are unchanged while the Spark job count
    * stays FLAT in numMerges (tools.TrainerJobCount measures it).
    * Per-round work is incremental: only words containing the winning pair
    * re-segment and re-count.
    */
  private def trainRounds[M](docs: DataFrame, textCol: String,
      numMerges: Int, name: String, pick: (DriverVocab, Int) => Option[M],
      pairOf: M => (String, String)): Seq[M] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val words = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect()
    val vocab = new DriverVocab(words.map(r => (r.getString(0), r.getLong(1))))
    val merges = Seq.newBuilder[M]
    for (r <- 1 to numMerges) {
      val m = pick(vocab, r)
      require(m.nonEmpty, s"$name: no adjacent pairs left at round $r")
      merges += m.get
      val (l, rr) = pairOf(m.get)
      vocab.applyMerge(l, rr)
    }
    merges.result()
  }

  /** Driver-local trainer state: per-word segmentations plus incrementally
    * maintained pair counts, symbol counts, and a pair → containing-words
    * index, all weighted by word frequency. The arithmetic mirrors the
    * in-plan formulation exactly: pair counts = adjacent-occurrence
    * multiplicity × word count (the explode semantics), symbol counts =
    * occurrence multiplicity × word count, and a merge is the greedy
    * non-overlapping left-to-right pass (what the unit-owned-space
    * `replace` performs — see the object scaladoc).
    */
  private final class DriverVocab(words: Array[(String, Long)]) {
    import scala.collection.mutable
    // initial segmentation = code points, as regexp "(.)" splits them
    private val segs: Array[Array[String]] = words.map(_._1.codePoints()
      .toArray.map(cp => new String(Character.toChars(cp))))
    private val cnts: Array[Long] = words.map(_._2)
    private val pairCounts = mutable.HashMap.empty[(String, String), Long]
    private val symCountsM = mutable.HashMap.empty[String, Long]
    private val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    segs.indices.foreach(contribute(_, 1))

    private def contribute(i: Int, sign: Int): Unit = {
      val s = segs(i); val w = cnts(i) * sign
      var j = 0
      while (j < s.length) {
        symCountsM.updateWith(s(j))(c => Some(c.getOrElse(0L) + w)
          .filter(_ != 0L))
        if (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          pairCounts.updateWith(p)(c => Some(c.getOrElse(0L) + w)
            .filter(_ != 0L))
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        }
        j += 1
      }
      if (sign < 0) {
        var k = 0
        while (k < s.length - 1) {
          val p = (s(k), s(k + 1))
          pairWords.get(p).foreach { set =>
            set -= i; if (set.isEmpty) pairWords.remove(p)
          }
          k += 1
        }
      }
    }

    /** Spark's UTF8String asc = DuckDB's memcmp = unsigned UTF-8 bytes. */
    private def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

    private def pairLt(a: (String, String), b: (String, String)): Boolean =
      if (a._1 != b._1) utf8Lt(a._1, b._1) else utf8Lt(a._2, b._2)

    /** Argmax by (count DESC, l ASC, r ASC) — the [[train]] order. */
    def bestByCount(): Option[(String, String, Long)] = {
      var best: Option[((String, String), Long)] = None
      pairCounts.foreach { case (p, c) =>
        if (best.forall { case (bp, bc) => c > bc || (c == bc && pairLt(p, bp)) })
          best = Some((p, c))
      }
      best.map { case ((l, r), c) => (l, r, c) }
    }

    /** Argmax by (c/(cl·cr) DESC, l ASC, r ASC) with the same IEEE-double
      * score expression as the in-plan/oracle formulation — the
      * [[trainWordPiece]] order. Returns (l, r, c, cl, cr).
      */
    def bestByLikelihood(): Option[(String, String, Long, Long, Long)] = {
      var best: Option[((String, String), Long, Long, Long, Double)] = None
      pairCounts.foreach { case (p, c) =>
        val cl = symCountsM(p._1); val cr = symCountsM(p._2)
        val score = c.toDouble / (cl.toDouble * cr.toDouble)
        if (best.forall { case (bp, _, _, _, bs) =>
          score > bs || (score == bs && pairLt(p, bp)) })
          best = Some((p, c, cl, cr, score))
      }
      best.map { case ((l, r), c, cl, cr, _) => (l, r, c, cl, cr) }
    }

    /** Re-segment only the words containing (l, r); update counts. */
    def applyMerge(l: String, r: String): Unit = {
      val affected = pairWords.get((l, r)).map(_.toArray).getOrElse(Array.empty[Int])
      affected.foreach { i =>
        contribute(i, -1)
        val s = segs(i)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == l && s(j + 1) == r) { out += l + r; j += 2 }
          else { out += s(j); j += 1 }
        }
        segs(i) = out.result()
        contribute(i, 1)
      }
    }
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
      pick = (v, r) => v.bestByLikelihood().map { case (l, rr, c, cl, cr) =>
        WpMerge(r, l, rr, c, cl, cr) },
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
    * merge table rides inside a codegen kernel
    * ([[graft.functions.BpeOps.tokenLen]] — one addReferenceObj, not
    * per-merge string replaces; [[segmentWithMerges]] stays as the
    * defining string algebra the kernel is fuzz-pinned against and the
    * DuckDB oracle replays). Documents with ZERO tokenizable words
    * (null/empty/punctuation-only text) are kept with
    * `n_tok_trained = 0` — the explode contracts them away, so the
    * aggregate is re-joined against the id set; silently dropping rows
    * would make per-corpus token sums lie.
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val ordered = merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))
    val perWord = docs
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("n",
        graft.functions.BpeFunctions.bpe_token_len(col("w"), ordered))
    val counts = perWord.groupBy(col(idCol))
      .agg(sum(col("n").cast("long")).as("__n_tok"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n_tok"), lit(0L)).as("n_tok_trained"))
  }
}
