package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Property suite for [[graft.functions.TextHashOps.lehmerMix]] — the
  * int64 Schrage implementation of the sketch family's position mixer.
  * The DEFINING semantics is the exact DECIMAL(38,0) chain
  * `(…((h+1)·48271 % P57)…·48271 % P57)` with truncated `%` (sign of
  * dividend), which the DuckDB oracle replays in HUGEINT; the shipped
  * column must be value-identical on the FULL long line or persisted
  * sketches and the oracle mirror silently drift. Three pins:
  * scalar-vs-BigInt over random + adversarial longs, the Column
  * expression vs the literal Decimal chain through a real plan, and the
  * bijection property on the P57 line that makes `distinct(mixed) ==
  * distinct(raw)` (kmvDistinct's one-pass trick).
  */
object LehmerMixSpec extends Properties("lehmerMix") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40).withWorkers(1)

  private val P57 = graft.ops.Sketch.P57

  /** BigInt reference — the defining chain, verbatim. */
  private def ref(h: Long, rounds: Int): Long = {
    var x = BigInt(h) + 1
    var i = 0
    while (i < rounds) { x = x * 48271 % P57; i += 1 }
    x.toLong
  }

  // the full long line, weighted toward the edges the Schrage path
  // special-cases: the +1 overflow (Long.MaxValue), negatives (truncated
  // % keeps the dividend's sign), multiples/neighbors of P57 (the first
  // reduction), and the contract domain [0, P57)
  private val genH: Gen[Long] = Gen.oneOf(
    Gen.const(Long.MaxValue), Gen.const(Long.MinValue),
    Gen.const(-1L), Gen.const(0L), Gen.const(1L),
    Gen.const(P57 - 1), Gen.const(P57), Gen.const(-P57),
    Gen.const(P57 + 5), Gen.const(-(P57 + 5)),
    Gen.chooseNum(0L, P57 - 1),
    Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private val genRounds: Gen[Int] = Gen.chooseNum(1, 4)

  property("equals the DECIMAL(38,0) defining chain on the full long line") =
    forAll(genH, genRounds) { (h, rounds) =>
      graft.functions.TextHashOps.lehmerMix(h, rounds) == ref(h, rounds)
    }

  property("scalar twins equal their Column twins' defining chain") =
    forAll(genH) { h =>
      graft.ops.Sketch.mixedPositionLong(h) == ref(h, 2) &&
        graft.ops.Sketch.mixedPosition2Long(h) == ref(h, 3)
    }

  property("column expression equals the literal Decimal chain in a plan") = {
    lazy val spark = TestSpark.session
    forAll(Gen.listOfN(24, genH)) { hs =>
      import spark.implicits._
      val d38 = DecimalType(38, 0)
      def decChain(rounds: Int) = {
        var cur = (col("h").cast(d38) + lit(1)) * lit(48271) % lit(P57)
        (2 to rounds).foreach(_ => cur = cur.cast(d38) * lit(48271) % lit(P57))
        cur.cast("long")
      }
      val rows = hs.toDF("h").select(
        graft.ops.Sketch.mixedPosition(col("h")).as("m2"),
        graft.ops.Sketch.mixedPosition2(col("h")).as("m3"),
        decChain(2).as("d2"), decChain(3).as("d3"))
        .where(col("m2") =!= col("d2") || col("m3") =!= col("d3"))
      rows.count() == 0L
    }
  }

  property("bijection on [0, P57): distinct mixed == distinct raw") =
    forAll(Gen.listOfN(60, Gen.chooseNum(0L, P57 - 1))) { hs =>
      hs.map(graft.functions.TextHashOps.lehmerMix(_, 2)).distinct.size ==
        hs.distinct.size
    }
}
