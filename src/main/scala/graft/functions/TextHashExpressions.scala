package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd wrappers around the [[TextHashOps]] kernels. Each generates a
  * single static call inside whole-stage codegen (no CodegenFallback, no
  * per-element interpretation) — the same pattern as [[DotProduct]].
  */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class ShingleHashesAtExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_at"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.shingleHashesAt(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.shingleHashesAt($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesAtExpr =
    copy(child = newChild)
}

/** Row-local frozen-set membership over a hash array: returns the indexes
  * whose hash is in the SORTED `set` (binary search — O(log |set|) per
  * element, vs array_contains' linear scan). The set rides into generated
  * code as a reference object, so the lookup stays inside whole-stage
  * codegen with zero per-row allocation beyond the result.
  */
case class MatchedStartsExpr(child: Expression, set: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "matched_starts"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.matchedStarts(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchSet", set, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.matchedStarts($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatchedStartsExpr =
    copy(child = newChild)
}

/** Winnowing fingerprints (position + hash structs) — codegen'd wrapper
  * over [[TextHashOps.winnowHashes]]. */
case class WinnowHashesExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.winnowHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.winnowHashes($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashesExpr =
    copy(child = newChild)
}

/** Content-defined chunks (start/len/hash structs) — codegen'd wrapper
  * over [[TextHashOps.cdcChunks]]. */
case class CdcChunksExpr(child: Expression, k: Int, maskBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.cdcChunks(input.asInstanceOf[UTF8String], k, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.cdcChunks($c, $k, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** `rounds` Lehmer rounds of `h + 1` on the P57 line (Schrage, exact in
  * int64) — the sketch family's position mixer without the per-row
  * DECIMAL(38,0) allocation of the defining chain. Value-identical to
  * that chain on the full long line (LehmerMixSpec).
  */
case class LehmerMixExpr(child: Expression, rounds: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lehmer_mix"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.lehmerMix(input.asInstanceOf[Long], rounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.lehmerMix($c, $rounds)")

  override protected def withNewChildInternal(newChild: Expression): LehmerMixExpr =
    copy(child = newChild)
}

/** Normalized words (lowercased, [a-z0-9] runs) in document order with
  * multiplicity — the one-pass codegen twin of TextAnalysis.words'
  * defining regex chain (equal for ASCII text, the documented kernel
  * contract; WordsKernelSpec).
  */
case class WordsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "words_arr"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.wordsArr(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.wordsArr($c)")

  override protected def withNewChildInternal(newChild: Expression): WordsExpr =
    copy(child = newChild)
}

/** One-pass PII count-and-redact scan — struct(clean, n_email, n_ipv4,
  * n_phone, n_ssn, n_idnum), byte-equal to the sequential 5-category
  * regex chain (PiiScanOps scaladoc has the equivalence argument;
  * PiiKernelSpec fuzzes it).
  */
case class PiiScanExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ssn", IntegerType, nullable = false),
    StructField("n_idnum", IntegerType, nullable = false)))
  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(input: Any): Any =
    PiiScanOps.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScanOps.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)
}

case class WordHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.wordHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.wordHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): WordHashesExpr =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_bigram", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_digit_only", IntegerType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

case class PassageHashesExpr(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "passage_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.passageHashes(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.passageHashes($c, $window, $stride)")

  override protected def withNewChildInternal(newChild: Expression): PassageHashesExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class ClassifierScoreExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))
  override def prettyName: String = "classifier_score"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.classifierScore(input.asInstanceOf[UTF8String], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashOps.classifierScore($c, $numBuckets)")

  override protected def withNewChildInternal(newChild: Expression): ClassifierScoreExpr =
    copy(child = newChild)
}

/** [[ClassifierScoreExpr]] with a TRAINED weight table: the bucket-indexed
  * long array rides into generated code via `addReferenceObj` (one object
  * per codegen, not per row) — the model artifact lives in the expression,
  * so inference is still a single whole-stage-codegen projection with no
  * join. `weights` is a Seq for sane Catalyst equality semantics (an
  * Array param would compare by reference and break semanticEquals).
  */
case class ClassifierScoreWeightedExpr(child: Expression, weights: Seq[Long])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  require(weights.nonEmpty, "trained classifier needs a non-empty weight table")
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))
  override def prettyName: String = "classifier_score_trained"

  @transient private lazy val weightArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.classifierScoreWeighted(
      input.asInstanceOf[UTF8String], weightArr, weightArr.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clsWeights", weights.toArray, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashOps.classifierScoreWeighted($c, $wRef, ${weights.length})")
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierScoreWeightedExpr =
    copy(child = newChild)
}

case class SimHash31Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash31"

  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.simhash31(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.simhash31($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash31Expr =
    copy(child = newChild)
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("langGuess", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("nTokensWs", IntegerType, nullable = false),
    StructField("nTokensBpe", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsOps.analyze(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsOps.analyze($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextFunctions {
  /** Distinct 57-bit rolling hashes of n-word shingles of normalized text. */
  def shingle_hashes(text: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashesExpr(GraftBridge.expression(text), n))

  /** Positional n-word shingle hashes: index i = the shingle starting at
    * word i, no dedup (the span-redaction correspondence). */
  def shingle_hashes_at(text: Column, n: Int = 3): Column =
    GraftBridge.column(ShingleHashesAtExpr(GraftBridge.expression(text), n))

  /** Winnowing fingerprints: `(pos, h)` structs of the window-minimum
    * k-gram hashes (ties rightmost) — alignment-robust local
    * fingerprinting (any ≥ w+k−1 char match shares one). */
  def winnow_hashes(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowHashesExpr(GraftBridge.expression(text), k, w))

  /** Content-defined chunks `(start, len, h)` covering the text —
    * boundary after any char k-gram whose poly-57 hash has `maskBits`
    * low zero bits (codegen'd). */
  def cdc_chunks(text: Column, k: Int = 16, maskBits: Int = 6): Column =
    GraftBridge.column(CdcChunksExpr(GraftBridge.expression(text), k, maskBits))

  /** Indexes of `hashes` that are members of the SORTED frozen `set`
    * (binary search, codegen'd) — the row-local serve-time twin of a
    * broadcast gram join. */
  def matched_starts(hashes: Column, set: Array[Long]): Column =
    GraftBridge.column(MatchedStartsExpr(GraftBridge.expression(hashes), set))

  /** `rounds` Lehmer rounds of `h + 1` mod P57, long-exact (Schrage) —
    * the caller must hand a LONG column (the sketch entry points cast). */
  def lehmer_mix(h: Column, rounds: Int): Column =
    GraftBridge.column(LehmerMixExpr(GraftBridge.expression(h), rounds))

  /** Per-word 57-bit hashes in document order, with multiplicity (bag
    * semantics — unlike shingle_hashes(n=1), which dedups). */
  def word_hashes(text: Column): Column =
    GraftBridge.column(WordHashesExpr(GraftBridge.expression(text)))

  /** Normalized words in document order with multiplicity — the one-pass
    * kernel behind TextAnalysis.words. */
  def words_arr(text: Column): Column =
    GraftBridge.column(WordsExpr(GraftBridge.expression(text)))

  /** One-pass PII scan struct — the kernel behind graft.ops.Pii. */
  def pii_scan(text: Column): Column =
    GraftBridge.column(PiiScanExpr(GraftBridge.expression(text)))

  /** k-function MinHash signature (array<long>) over shingle hashes. */
  def minhash_sig(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(hashes), k))

  /** Aligned character-window passage hashes of the RAW text. */
  def passage_hashes(text: Column, window: Int, stride: Int): Column =
    GraftBridge.column(PassageHashesExpr(GraftBridge.expression(text), window, stride))

  /** One-pass repetition stats struct: n_words/n_distinct/max_bigram/
    * n_bigrams. */
  def repetition_stats(text: Column): Column =
    GraftBridge.column(RepetitionStatsExpr(GraftBridge.expression(text)))

  /** One-pass hashed-feature classifier score struct: n_words/score_sum. */
  def classifier_score(text: Column, numBuckets: Int): Column =
    GraftBridge.column(ClassifierScoreExpr(GraftBridge.expression(text), numBuckets))

  /** [[classifier_score]] with a trained bucket-indexed weight table
    * (index = wordHash mod weights.length). */
  def classifier_score_trained(text: Column, weights: Seq[Long]): Column =
    GraftBridge.column(ClassifierScoreWeightedExpr(GraftBridge.expression(text), weights))

  /** 31-bit SimHash of normalized text; -1 when the text has no words. */
  def simhash31(text: Column): Column =
    GraftBridge.column(SimHash31Expr(GraftBridge.expression(text)))

  /** One-pass text stats struct: langGuess/quality/nTokensWs/nTokensBpe/
    * fingerprint. */
  def text_stats(text: Column): Column =
    GraftBridge.column(TextStatsExpr(GraftBridge.expression(text)))
}
