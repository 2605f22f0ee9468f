package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-application kernel for the BPE/WordPiece token counters
  * ([[graft.ops.Bpe.tokenCounts]]): apply a trained merge table to a word
  * in rank order and return the surviving symbol count.
  *
  * DEFINING form (the oracle's mirror and the property pin,
  * [[graft.ops.Bpe.segmentWithMerges]]): the unit-owned-space string
  * algebra — `regexp_replace(word, "(.)", " \$1 ")`, then one
  * `replace(" l  r ", " lr ")` per merge, then
  * `size(filter(split(trim(seg), " "), length > 0))`. Each of those
  * steps builds a ~3×-word-length string per merge per word; this kernel
  * computes the identical count with one int-array pass per merge.
  *
  * Equality argument: symbols are INTERNED BY STRING (two merges fusing
  * to the same text produce the same id, exactly as the string algebra
  * matches " lr " regardless of which merge wrote it), and the per-merge
  * scan is greedy left-to-right non-overlapping — precisely what
  * `replace` does over the unit-owned-space encoding (" a  a  a " under
  * (a,a) → " aa  a ": positions 0-1 fuse, position 2 survives).
  * BpeKernelSpec fuzz-pins count equality against the defining chain
  * over random words and random (chained, self-merging, duplicate-output)
  * merge tables. The model rides inside the expression via one
  * `addReferenceObj` (the [[UnigramOps]] pattern), so counting is a
  * single whole-stage-codegen projection.
  */
final class BpeMergeModel(val lhs: Array[String], val rhs: Array[String])
    extends Serializable {
  require(lhs.length == rhs.length,
    s"lhs/rhs length mismatch: ${lhs.length} vs ${rhs.length}")

  final class Tbl(val mergeL: Array[Int], val mergeR: Array[Int],
      val mergeOut: Array[Int], val charId: Array[Int])

  // volatile one-time build: an instance is shared across executor task
  // threads (the UnigramVocab rule)
  @transient @volatile private var tbl: Tbl = _

  def table: Tbl = {
    if (tbl == null) synchronized {
      if (tbl == null) {
        val ids = new java.util.HashMap[String, Integer]()
        def id(s: String): Int = {
          val g = ids.get(s)
          if (g != null) g.intValue()
          else { val n = ids.size(); ids.put(s, n); n }
        }
        val n = lhs.length
        val l = new Array[Int](n)
        val r = new Array[Int](n)
        val o = new Array[Int](n)
        var k = 0
        while (k < n) {
          l(k) = id(lhs(k)); r(k) = id(rhs(k)); o(k) = id(lhs(k) + rhs(k))
          k += 1
        }
        // direct single-char lookup for the ASCII line (words() output);
        // -1 = the char is no merge operand and stays a singleton symbol
        val charId = Array.fill(128)(-1)
        ids.forEach { (s, i) =>
          if (s.length == 1 && s.charAt(0) < 128) charId(s.charAt(0)) = i
        }
        tbl = new Tbl(l, r, o, charId)
      }
    }
    tbl
  }
}

object BpeOps {

  /** Symbol count of `word` after applying the merge table in rank order —
    * `size(syms(segmentWithMerges(word, merges)))` without the string
    * algebra. A char that is no merge operand gets the id −(code+1):
    * negative, per-char unique, never equal to a table id — it rides
    * through every merge untouched, exactly like its " c " unit.
    */
  def tokenLen(word: UTF8String, m: BpeMergeModel): Int = {
    val w = word.toString
    var len = w.length
    if (len == 0) return 0
    val t = m.table
    val ids = new Array[Int](len)
    var i = 0
    while (i < len) {
      val c = w.charAt(i)
      val ci = if (c < 128) t.charId(c) else -1
      ids(i) = if (ci >= 0) ci else -(c.toInt + 1)
      i += 1
    }
    var k = 0
    while (k < t.mergeL.length && len > 1) {
      val l = t.mergeL(k); val r = t.mergeR(k); val o = t.mergeOut(k)
      var rd = 0
      var wr = 0
      while (rd < len) {
        if (rd + 1 < len && ids(rd) == l && ids(rd + 1) == r) {
          ids(wr) = o; rd += 2
        } else { ids(wr) = ids(rd); rd += 1 }
        wr += 1
      }
      len = wr
      k += 1
    }
    len
  }
}

case class BpeTokenLenExpr(child: Expression, lhs: Seq[String],
    rhs: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_len"

  @transient private lazy val model: BpeMergeModel =
    new BpeMergeModel(lhs.toArray, rhs.toArray)

  override protected def nullSafeEval(input: Any): Any =
    BpeOps.tokenLen(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMergeModel", model,
      classOf[BpeMergeModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.tokenLen($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenLenExpr =
    copy(child = newChild)
}

object BpeFunctions {
  /** Token count of a word under a trained merge table (rank order =
    * sequence order of `merges`).
    */
  def bpe_token_len(word: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenLenExpr(GraftBridge.expression(word),
      merges.map(_._1), merges.map(_._2)))
}
