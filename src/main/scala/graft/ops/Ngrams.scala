package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide frequent-phrase mining: exact multiset counts of word
  * n-grams and the deterministic top-k — the data-card / boilerplate-
  * discovery stage (the phrases a C4-style pipeline inspects before
  * choosing removal rules, and the "most common n-grams" table every
  * dataset report ships). Unlike the dedup family's
  * [[graft.functions.TextHashOps.shingleHashes]] (distinct hashes, for
  * signatures), mining needs the STRINGS back with MULTIPLICITY.
  *
  * Scale shape: the word-count shape — explode n-gram occurrences (no
  * HOF lambda: `explode(sequence)` + `slice`/`concat_ws` are all
  * codegen'd), one gram-keyed aggregate with map-side partial counts,
  * `minCount` pruning BEFORE any sort cuts the long unique tail (the
  * overwhelming majority of grams at web scale), and the top-k plans as
  * TakeOrderedAndProject — per-partition partial top-k, only k rows ever
  * reach the driver side of the sort. One shuffle total.
  *
  * Determinism: ties in count are broken by the gram string ascending, so
  * the top-k cut is unique and the DuckDB oracle reproduces it exactly.
  */
object Ngrams {

  /** Exact `(gram, cnt)` counts of word n-grams over the corpus
    * (normalized words, space-joined), keeping grams with `cnt >=
    * minCount`. NULL/short texts contribute nothing.
    */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int,
      minCount: Long = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    docs.select(TextAnalysis.words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) >= n)
      .select(col("__ws"),
        explode(sequence(lit(0), size(col("__ws")) - n)).as("__i"))
      .select(concat_ws(" ", slice(col("__ws"), col("__i") + 1, lit(n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** The deterministic top-k: count descending, gram ascending on ties.
    * Plans as TakeOrderedAndProject over the pruned counts
    * (PlanQualitySpec pins it).
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int,
      minCount: Long = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ngramCounts(docs, textCol, n, minCount)
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }
}
