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

/** Plane-projection dots kernel — the same literal-array fix as
  * [[BandOps.bandBuckets]] for the callers that need the RAW projections
  * rather than packed sign bits: [[graft.ops.Similarity.signProject]]
  * (JL projection of the whole corpus — outDims separate 512-literal
  * dot expressions per row before this) and
  * [[graft.ops.Similarity.hyperplaneProbes]] (multi-probe's
  * weakest-bit ranking needs |dot| per plane). Element p is the
  * ascending sequential IEEE fold of `v · family-sign-row(firstPlane +
  * p)` — bit-identical to `DotProduct(v, signRow(p))`, so downstream
  * rounding/comparison semantics (Spark's own `round`, the `> 0` sign
  * cut, the |dot| sort) are byte-for-byte unchanged. `family` selects
  * the banding ([[graft.ops.Similarity.bandSign]]) or JL-projection
  * ([[graft.ops.Similarity.projSign]]) matrix — independent salts,
  * never mix them.
  */
final class PlaneModel(val firstPlane: Int, val nPlanes: Int,
    val family: String) extends Serializable {
  require(nPlanes >= 1, s"nPlanes must be >= 1: $nPlanes")
  require(family == "band" || family == "proj", s"unknown family: $family")

  @transient @volatile private var signs: Array[Array[Double]] = _

  def signMatrix: Array[Array[Double]] = {
    if (signs == null) synchronized {
      if (signs == null) {
        val f: (Int, Int) => Double =
          if (family == "band") graft.ops.Similarity.bandSign
          else graft.ops.Similarity.projSign
        signs = Array.tabulate(nPlanes)(p =>
          Array.tabulate(512)(i => f(firstPlane + p, i + 1)))
      }
    }
    signs
  }
}

object PlaneOps {
  def planeDots(v: ArrayData, m: PlaneModel): ArrayData = {
    val n = math.min(v.numElements(), 512)
    val sm = m.signMatrix
    val out = new Array[Double](m.nPlanes)
    var p = 0
    while (p < m.nPlanes) {
      val row = sm(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += v.getDouble(i) * row(i)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }
}

case class PlaneDotsExpr(child: Expression, firstPlane: Int, nPlanes: Int,
    family: String) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "plane_dots"

  @transient private lazy val model: PlaneModel =
    new PlaneModel(firstPlane, nPlanes, family)

  override protected def nullSafeEval(input: Any): Any =
    PlaneOps.planeDots(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeModel", model, classOf[PlaneModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PlaneOps.planeDots($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDotsExpr =
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

  /** Raw projections of a double-array vector onto `nPlanes` consecutive
    * sign planes of the given family ("band" | "proj").
    */
  def plane_dots(v: Column, nPlanes: Int, family: String,
      firstPlane: Int = 0): Column =
    GraftBridge.column(PlaneDotsExpr(GraftBridge.expression(v),
      firstPlane, nPlanes, family))
}
