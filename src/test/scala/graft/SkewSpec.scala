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
}
