package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path. AQE's skew-join splitting
  * covers joins automatically; these cover the aggregation side, where one
  * hot key (one viral document source, one null-ish FK) can pin a single
  * reducer.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates across `saltBuckets` reducers, then a second tiny
    * aggregation merges partials per key. Correct for decomposable
    * aggregates (sum/count/min/max — pass the partial-merge expressions).
    *
    * Example:
    * {{{
    * saltedAggregate(df, Seq(col("k")), 32,
    *   partial = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
    *   merge   = Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
    * }}}
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[Column],
      saltBuckets: Int,
      partial: Seq[Column],
      merge: Seq[Column],
  ): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Replicated broadcast-side salt for joining a skewed fact key against a
    * small dimension when broadcast isn't possible: explode the small side
    * `saltBuckets`× with a salt column, salt the big side randomly but
    * deterministically (hash of a unique column), join on (key, salt).
    * Every hot key spreads over `saltBuckets` reducers.
    */
  def saltedJoin(
      big: DataFrame, bigKey: Column, bigUnique: Column,
      small: DataFrame, smallKey: Column,
      saltBuckets: Int,
  ): DataFrame = {
    val bigSalted = big.withColumn("__salt", pmod(xxhash64(bigUnique), lit(saltBuckets)))
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    bigSalted.join(smallSalted,
      bigKey === smallKey && bigSalted("__salt") === smallSalted("__salt"))
      .drop("__salt")
  }
}
