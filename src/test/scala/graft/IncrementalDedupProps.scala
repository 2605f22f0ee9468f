package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property suite for the exact criterion's daily-increment contract
  * ([[graft.ops.Dedup.dedupIncremental]] vs [[exactDedup]]): growing a
  * deduped corpus by an increment must equal the full rerun — for ANY
  * corpus/batch split at an id watershed (corpus ids precede batch ids,
  * the family's stated precondition), the incremental survivors are
  * exactly the full-rerun survivors that fall in the batch. The OpsSpec
  * examples pin this pointwise; this sweep randomizes key collision
  * rates, duplicate multiplicities, and the watershed itself. Also
  * sweeps the index's key-only contract: the index is built from corpus
  * KEYS (post-dedup or raw — same key set, both generated here).
  */
object IncrementalDedupProps extends Properties("dedupIncremental") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withWorkers(1)

  private lazy val spark = TestSpark.session

  // (id, key): unique ids, keys from a small alphabet so duplicate
  // groups straddle the watershed often
  private val genCase: Gen[(List[(Long, Long)], Long, Boolean)] = for {
    n <- Gen.chooseNum(1, 60)
    nKeys <- Gen.chooseNum(1, 12)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, nKeys.toLong - 1))
    watershed <- Gen.chooseNum(0, n)
    dedupIndexSide <- Gen.oneOf(true, false)
  } yield (keys.zipWithIndex.map { case (k, i) => (i.toLong, k) },
    watershed.toLong, dedupIndexSide)

  property("increment + index == full rerun, for any id watershed") =
    forAll(genCase) { case (rows, watershed, dedupIndexSide) =>
      import spark.implicits._
      val all = rows.toDF("id", "key")
      val corpus = all.where(col("id") < watershed)
      val batch = all.where(col("id") >= watershed)
      // the accumulated index: corpus key table — whether built from the
      // raw corpus or its deduped form, the key SET is identical and the
      // increment must not care
      val corpusKeys =
        if (dedupIndexSide)
          graft.ops.Dedup.exactDedup(corpus, col("key"), "id")
            .select(col("key").as("key"))
        else corpus.select(col("key").as("key")).distinct()
      val incremental = graft.ops.Dedup.dedupIncremental(
          batch, corpusKeys, col("key"), "id")
        .select("id").as[Long].collect().toSet
      val fullRerun = graft.ops.Dedup.exactDedup(all, col("key"), "id")
        .select("id").as[Long].collect().toSet
      incremental == fullRerun.filter(_ >= watershed)
    }
}
