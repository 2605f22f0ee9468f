package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi kernel for the unigram-LM tokenizer (Kudo 2018, "Subword
  * Regularization" — public algorithm, reference-free implementation; the
  * SentencePiece-unigram family). The model is a piece table with log
  * probabilities; segmenting a word = the max-log-likelihood split, found
  * by dynamic programming over character positions.
  *
  * The model rides INSIDE the expression (the trained-classifier pattern:
  * one `addReferenceObj` per codegen, not per row), so segmentation is a
  * single whole-stage-codegen projection with no join — and the trainer
  * only ever evaluates it on the DISTINCT-WORD table (vocabulary-sized),
  * never the corpus.
  *
  * Determinism: the DP compares IEEE-double sums of log probabilities.
  * Near-equal path scores can collapse to exact double equality, where
  * the tie-break decides: candidates are scanned longest-piece-first with
  * a strict `>` update, so ties keep the LONGEST final piece (then the
  * earlier tie at the shorter prefix, recursively). Two runs over the
  * same data on any IEEE-754 JVM produce identical segmentations. With
  * the trainer's 2⁻⁴⁰ log-prob grid (ops.Unigram.mStep) every path sum
  * is EXACT dyadic arithmetic, so the same literal model yields
  * bit-identical scores in any engine — the property the committed-model
  * `d_unigram_tokens` oracle row relies on (its DuckDB replay enumerates
  * segmentations and applies this tie-break as a lexicographic
  * piece-length compare). The live TRAINER remains OpsSpec-gated: its EM
  * loop is not one SQL expression.
  */
final class UnigramVocab(val pieces: Array[String], val logProbs: Array[Double],
    val maxPieceLen: Int, val unkLogProb: Double) extends Serializable {
  require(pieces.length == logProbs.length,
    s"pieces/logProbs length mismatch: ${pieces.length} vs ${logProbs.length}")

  // volatile: one vocab instance can be shared across executor task
  // threads; without the fence a reader could observe a partially
  // published HashMap under the JMM (ADVICE r10)
  @transient @volatile private var idx: java.util.HashMap[String, Integer] = _

  def index: java.util.HashMap[String, Integer] = {
    if (idx == null) synchronized {
      if (idx == null) {
        val m = new java.util.HashMap[String, Integer](pieces.length * 2)
        var i = 0
        while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
        idx = m
      }
    }
    idx
  }
}

object UnigramOps {

  /** Core DP. Returns backpointers (`back(i)` = start of the piece ending
    * at `i` on the best path) and the best total log prob. Every position
    * is reachable: unknown single characters fall back to `unkLogProb`
    * (inference-only escape — at train time every character of the corpus
    * is in the vocabulary by construction).
    */
  private def solve(w: String, v: UnigramVocab): (Array[Int], Double) = {
    val n = w.length
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Double.NegativeInfinity)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var best = Double.NegativeInfinity
      var bestJ = -1
      var l = math.min(v.maxPieceLen, i)
      while (l >= 1) {
        val j = i - l
        if (dp(j) != Double.NegativeInfinity) {
          val id = v.index.get(w.substring(j, i))
          val lp =
            if (id != null) v.logProbs(id.intValue())
            else if (l == 1) v.unkLogProb
            else Double.NegativeInfinity
          if (lp != Double.NegativeInfinity) {
            val cand = dp(j) + lp
            if (cand > best) { best = cand; bestJ = j }
          }
        }
        l -= 1
      }
      dp(i) = best
      back(i) = bestJ
      i += 1
    }
    (back, dp(n))
  }

  private def walk(w: String, v: UnigramVocab): Array[Int] = {
    val (back, _) = solve(w, v)
    var i = w.length
    var count = 0
    while (i > 0) { count += 1; i = back(i) }
    val ids = new Array[Int](count)
    i = w.length
    var k = count - 1
    while (i > 0) {
      val j = back(i)
      val id = v.index.get(w.substring(j, i))
      ids(k) = if (id != null) id.intValue() else -1
      k -= 1
      i = j
    }
    ids
  }

  /** Piece ids (vocabulary indices; -1 for an unknown-char fallback) of
    * the best segmentation, in word order. */
  def pieceIds(word: UTF8String, v: UnigramVocab): GenericArrayData =
    new GenericArrayData(walk(word.toString, v))

  /** Token count of the best segmentation. */
  def tokenLen(word: UTF8String, v: UnigramVocab): Int = {
    val (back, _) = solve(word.toString, v)
    var i = word.toString.length
    var count = 0
    while (i > 0) { count += 1; i = back(i) }
    count
  }

  /** Log probability of the best segmentation. */
  def wordLogProb(word: UTF8String, v: UnigramVocab): Double =
    solve(word.toString, v)._2
}

/** The three unigram expressions share one parameter layout: the model as
  * Seqs (Catalyst-equality-sane, like [[ClassifierScoreWeightedExpr]]),
  * reassembled once per executor into the lookup-indexed [[UnigramVocab]].
  */
sealed trait UnigramExprBase extends UnaryExpression {
  def pieces: Seq[String]
  def logProbs: Seq[Double]
  def maxPieceLen: Int
  def unkLogProb: Double

  @transient protected lazy val vocab: UnigramVocab =
    new UnigramVocab(pieces.toArray, logProbs.toArray, maxPieceLen, unkLogProb)

  protected def vocabRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("unigramVocab", vocab, classOf[UnigramVocab].getName)
}

case class UnigramPieceIdsExpr(child: Expression, pieces: Seq[String],
    logProbs: Seq[Double], maxPieceLen: Int, unkLogProb: Double)
    extends UnigramExprBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "unigram_piece_ids"

  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.pieceIds(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vocabRef(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramOps.pieceIds($c, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPieceIdsExpr =
    copy(child = newChild)
}

case class UnigramTokenLenExpr(child: Expression, pieces: Seq[String],
    logProbs: Seq[Double], maxPieceLen: Int, unkLogProb: Double)
    extends UnigramExprBase {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "unigram_token_len"

  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.tokenLen(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vocabRef(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramOps.tokenLen($c, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenLenExpr =
    copy(child = newChild)
}

case class UnigramWordLogProbExpr(child: Expression, pieces: Seq[String],
    logProbs: Seq[Double], maxPieceLen: Int, unkLogProb: Double)
    extends UnigramExprBase {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "unigram_word_logprob"

  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.wordLogProb(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vocabRef(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramOps.wordLogProb($c, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramWordLogProbExpr =
    copy(child = newChild)
}

object UnigramFunctions {
  def unigram_piece_ids(word: Column, pieces: Seq[String], logProbs: Seq[Double],
      maxPieceLen: Int, unkLogProb: Double): Column =
    GraftBridge.column(UnigramPieceIdsExpr(GraftBridge.expression(word),
      pieces, logProbs, maxPieceLen, unkLogProb))

  def unigram_token_len(word: Column, pieces: Seq[String], logProbs: Seq[Double],
      maxPieceLen: Int, unkLogProb: Double): Column =
    GraftBridge.column(UnigramTokenLenExpr(GraftBridge.expression(word),
      pieces, logProbs, maxPieceLen, unkLogProb))

  def unigram_word_logprob(word: Column, pieces: Seq[String], logProbs: Seq[Double],
      maxPieceLen: Int, unkLogProb: Double): Column =
    GraftBridge.column(UnigramWordLogProbExpr(GraftBridge.expression(word),
      pieces, logProbs, maxPieceLen, unkLogProb))
}
