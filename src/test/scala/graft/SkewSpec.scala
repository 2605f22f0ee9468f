package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salted aggregation/join correctness: results must equal the unsalted
  * equivalents while spreading hot keys over many reducers.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private lazy val skewed = spark.range(100000)
    .select((when($"id" % 10 === 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 50)))
      .as("k"), ($"id" % 7).cast("double").as("v"))

  test("saltedAggregate equals plain groupBy aggregate") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedAggregate(skewed, Seq(col("k")), 16,
      partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      merge = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == plain(k)._1)
      assert(math.abs(s - plain(k)._2) < 1e-6)
    }
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k2", "K2")).toDF("dk", "label")
    val plain = skewed.join(dim, $"k" === $"dk").count()
    val salted = Skew.saltedJoin(skewed, col("k"), col("v") + xxhash64(col("k")),
      dim, col("dk"), 8).count()
    // salt on a non-unique column still correct (any deterministic spread)
    assert(salted == plain)
  }

  test("AQE skew-join split engages on residual hot keys (the 100 TB safety net)") {
    // Salting handles KNOWN hot keys; the documented fallback for residual
    // skew (Similarity scaladoc, BENCH_NOTES) is AQE's skew-join split.
    // Prove it actually fires: a shuffle join with one dominant key under
    // test-sized thresholds must show skew-handled SMJ partitions in the
    // final adaptive plan.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
      // fact: one dominant key (~99% of 400k rows, wide payload so the hot
      // shuffle partition crosses the 64KB threshold); dim: every key once
      val hot = spark.range(400000)
        .select(when($"id" % 100 < 99, lit("hot")).otherwise(concat(lit("k"), $"id" % 37))
          .as("k"), concat(lit("payload-"), $"id").as("payload"))
      val dim = spark.range(38)
        .select(when($"id" === 0, lit("hot")).otherwise(concat(lit("k"), $"id" - 1))
          .as("k2"), $"id".as("p2"))
      // a GLOBAL aggregate on top: unlike groupBy(k), it imposes no hash
      // distribution above the join, so AQE is free to split the skewed
      // partition (splitting under a same-key groupBy would add a shuffle,
      // which OptimizeSkewedJoin declines)
      val joined = hot.join(dim, $"k" === $"k2")
        .select(sum(length($"payload")).as("bytes"))
      assert(joined.collect().head.getLong(0) > 0) // materialize; AQE finalizes
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(3000))
      // AQE marks the skew-handled join and the split shuffle reads
      assert(p.contains("skew=true") || p.contains("skewed"), p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
