package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass hyperplane-band bucket kernel — the signature transform of
  * the whole cosine-LSH family (every banded dedup index, prober, and
  * ANN row).
  *
  * DEFINING form (the oracle's mirror and the property pin,
  * [[graft.ops.Similarity.hyperplaneBucket]]): per band, a fold of
  * `planesPerBand` sign bits, each bit `dot(v, signRow(p)) > 0` with
  * the plane row a constant-folded ±1 literal array and the dot the
  * sequential-fold [[DotProduct]]. That shape evaluates bands·planes
  * SEPARATE codegen dot expressions per row — at the sf1.0 corpus the
  * banding of d_dedup_cosine_lsh computes 8·12 = 96 of them per vector,
  * each re-traversing the vector through expression plumbing.
  *
  * This kernel computes ALL band buckets in one call: the ±1 sign
  * matrix ([[graft.ops.Similarity.bandSign]], the v2 two-modular-
  * squares family) is precomputed once per plan into an
  * `addReferenceObj` model, and each plane's projection is the same
  * ascending sequential sum over `min(v.length, 512)` elements as
  * DotProduct's fold — bit-identical IEEE arithmetic, so buckets equal
  * the defining form's exactly (BandKernelSpec fuzz-pins equality over
  * random vectors, widths, and plane offsets; the DuckDB oracles are
  * untouched because the math is unchanged).
  */
final class BandModel(val firstPlane: Int, val planesPerBand: Int,
    val bands: Int) extends Serializable {
  require(planesPerBand >= 1 && planesPerBand <= 62,
    s"planesPerBand out of [1, 62]: $planesPerBand")
  require(bands >= 1, s"bands must be >= 1: $bands")
  require(firstPlane >= 0, s"firstPlane must be >= 0: $firstPlane")

  // volatile one-time build: shared across executor task threads
  @transient @volatile private var signs: Array[Array[Double]] = _

  def signMatrix: Array[Array[Double]] = {
    if (signs == null) synchronized {
      if (signs == null) {
        signs = Array.tabulate(bands * planesPerBand)(j =>
          Array.tabulate(512)(i =>
            graft.ops.Similarity.bandSign(firstPlane + j, i + 1)))
      }
    }
    signs
  }
}

object BandOps {

  /** All `bands` bucket ids of vector `v` — element b is the packed
    * MSB-first sign fold of planes `firstPlane + b·planesPerBand ..`,
    * exactly [[graft.ops.Similarity.hyperplaneBucket]]'s value.
    */
  def bandBuckets(v: ArrayData, m: BandModel): ArrayData = {
    val n = math.min(v.numElements(), 512)
    val sm = m.signMatrix
    val out = new Array[Long](m.bands)
    var b = 0
    var p = 0
    while (b < m.bands) {
      var bucket = 0L
      var j = 0
      while (j < m.planesPerBand) {
        val row = sm(p)
        var s = 0.0
        var i = 0
        // mirror DotProduct's fold exactly: ascending sequential sum,
        // null elements skipped (the sign row itself is never null)
        while (i < n) {
          if (!v.isNullAt(i)) s += v.getDouble(i) * row(i)
          i += 1
        }
        bucket = (bucket << 1) | (if (s > 0) 1L else 0L)
        j += 1
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class BandBucketsExpr(child: Expression, firstPlane: Int,
    planesPerBand: Int, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"

  @transient private lazy val model: BandModel =
    new BandModel(firstPlane, planesPerBand, bands)

  override protected def nullSafeEval(input: Any): Any =
    BandOps.bandBuckets(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bandModel", model, classOf[BandModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BandOps.bandBuckets($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandBucketsExpr =
    copy(child = newChild)
}

object BandFunctions {
  /** Array of `bands` hyperplane-band bucket ids of a double-array
    * vector column (band b uses planes starting at
    * `firstPlane + b·planesPerBand`).
    */
  def band_buckets(v: Column, planesPerBand: Int, bands: Int,
      firstPlane: Int = 0): Column =
    GraftBridge.column(BandBucketsExpr(GraftBridge.expression(v),
      firstPlane, planesPerBand, bands))
}
