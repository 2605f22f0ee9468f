package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suite for KMV sketch mergeability
  * ([[graft.ops.Sketch.kmvSketch]] / [[kmvMergeEstimate]] /
  * [[kmvDistinct]]): the 100 TB contract is that per-shard sketches
  * merge LOSSLESSLY — the merged estimate is set-identical to the
  * one-shot estimate over the raw rows, for ANY shard assignment. That
  * subsumes commutativity and associativity of the merge (two arbitrary
  * assignments are two arbitrary merge orders/groupings) and idempotence
  * (re-sharding the same rows changes nothing). Randomized sweep of the
  * value sets, group counts, duplicate rates, and shard assignments the
  * example-based specs pin only pointwise.
  *
  * Spark-backed, so the iteration count is deliberately small (each case
  * runs real aggregations); the scalar-level sweep lives in
  * [[CdcChunksProps]].
  */
object KmvMergeProps extends Properties("kmvMerge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withWorkers(1)

  private lazy val spark = TestSpark.session

  private val P57 = graft.ops.Sketch.P57

  // raw rows: (group, hash) with duplicates — hashes on the [0, P57) line
  // (the kernel contract), group cardinality 1-3, value counts around the
  // k = 64 sketch-full threshold on BOTH sides (under-k groups are exact,
  // over-k groups exercise the k-th-minimum estimate rule)
  private val genRows: Gen[List[(String, Long)]] = for {
    nGroups <- Gen.chooseNum(1, 3)
    rows <- Gen.listOfN(nGroups, Gen.chooseNum(1, 160)).flatMap { sizes =>
      Gen.sequence[List[List[(String, Long)]], List[(String, Long)]](
        sizes.zipWithIndex.map { case (n, g) =>
          Gen.listOfN(n, Gen.chooseNum(0L, P57 - 1).map(h => (s"g$g", h)))
        })
    }
  } yield rows.flatten
  private val genShards: Gen[Int] = Gen.chooseNum(1, 5)

  property("any shard assignment merges to the one-shot estimate, per group") =
    forAll(genRows, genShards, Gen.long) { (rows, nShards, seed) =>
      import spark.implicits._
      val base = rows.toDF("g", "h")
        // duplicate a slice of the rows: distinct semantics must hold
        // across shards (the same value landing in two shards is the
        // common case at scale)
        .union(rows.take(rows.size / 3).toDF("g", "h"))
        // deterministic pseudo-random shard assignment from the case seed
        .withColumn("shard",
          pmod(xxhash64(col("h"), lit(seed)), lit(nShards.toLong)))
      val oneShot = graft.ops.Sketch.kmvDistinct(base, "g", col("h"), k = 64)
        .select("g", "n_est").as[(String, Long)].collect().toMap
      val merged = graft.ops.Sketch.kmvMergeEstimate(
          graft.ops.Sketch.kmvSketch(base, "g", "shard", col("h"), k = 64), "g", k = 64)
        .as[(String, Long)].collect().toMap
      merged == oneShot
    }

  property("re-merging a merged sketch is the identity (idempotence)") =
    forAll(genRows, genShards) { (rows, nShards) =>
      import spark.implicits._
      val base = rows.toDF("g", "h")
        .withColumn("shard", pmod(xxhash64(col("h")), lit(nShards.toLong)))
      val shardSketches = graft.ops.Sketch.kmvSketch(base, "g", "shard", col("h"), k = 64)
      // collapse to ONE sketch row per group (positions = merged k-minima),
      // then run the merge again: the estimate must not move
      val collapsed = shardSketches
        .select(col("g"), explode(col("positions")).as("m"))
        .groupBy("g")
        .agg(slice(array_sort(collect_set(col("m"))), 1, 64).as("positions"))
        .withColumn("shard", lit(0))
      val est1 = graft.ops.Sketch.kmvMergeEstimate(shardSketches, "g", k = 64)
        .as[(String, Long)].collect().toMap
      val est2 = graft.ops.Sketch.kmvMergeEstimate(collapsed, "g", k = 64)
        .as[(String, Long)].collect().toMap
      est1 == est2
    }
}
