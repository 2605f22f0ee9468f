package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Designed for the 100 TB path:
  *
  *  - exact dedup is one hash-shuffle (group by text hash, keep min id);
  *  - MinHash/SimHash signatures are computed scan-side with higher-order
  *    functions (one pass, codegen, no UDFs), and near-dup candidates come
  *    from LSH band/block bucketing — the only shuffle is by short band
  *    keys, never an O(n²) cross join;
  *  - n-gram Jaccard prunes frequent shingles by document frequency before
  *    the inverted-index self-join, the standard guard against hub-shingle
  *    pair explosion.
  */
object Dedup {

  /** 3-word shingles of a normalized word array (empty when < n words). */
  def shingles(ws: Column, n: Int = 3): Column =
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup on a (possibly normalized) key: keeps the row with the
    * smallest `idCol` per duplicate group. One shuffle on the group key.
    */
  def exactDedup(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: `numHashes` independent salted-hash minima over the
    * shingle set. Each shingle string is hashed ONCE (let-bound long array);
    * the per-function variants rehash the 8-byte value, not the string.
    * Column type array<bigint>.
    */
  def minhashSignature(sh: Column, numHashes: Int = 32): Column =
    graft.functions.Exprs.let(transform(sh, s => xxhash64(s)), hs =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        j => aggregate(hs, lit(Long.MaxValue),
          (acc, h) => least(acc, xxhash64(h, j)))))

  /** LSH banding: hash each of `bands` contiguous signature slices; docs
    * sharing any band hash become candidate pairs. Estimated Jaccard =
    * fraction of matching signature positions.
    */
  def minhashLshPairs(
      docs: DataFrame, // (id, text)
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
  ): DataFrame = {
    val rows = numHashes / bands
    // repartition before the (CPU-heavy) signature scan: a small parquet
    // input may arrive as one split; signatures parallelize per row
    val sig = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        graft.functions.Exprs.let(TextAnalysis.words(col(textCol)),
          ws => graft.functions.Exprs.let(shingles(ws),
            sh => minhashSignature(sh, numHashes))).as("sig"))
      .where(size(col("sig")) > 0)
      .persist()
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows))), b))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bandHash"))
    // distinct candidate pairs FIRST (a pair colliding in several bands is
    // deduped before the signature compare runs), then score once per pair
    val pairs = banded.select(col("band"), col("bandHash"), col("id").as("idA"))
      .join(banded.select(col("band"), col("bandHash"), col("id").as("idB")),
        Seq("band", "bandHash"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    pairs
      .join(sig.select(col("id").as("idA"), col("sig").as("sigA")), "idA")
      .join(sig.select(col("id").as("idB"), col("sig").as("sigB")), "idB")
      .select(col("idA"), col("idB"),
        (aggregate(zip_with(col("sigA"), col("sigB"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes)).as("estJaccard"))
      .where(col("estJaccard") >= threshold)
  }

  /** 64-bit SimHash over the word bag: per bit, sum ±1 votes from each
    * word's hash bit, then pack the sign vector into one BIGINT. Expressed
    * as one SQL higher-order expression with internal let-bindings
    * (`transform(array(x), v -> …)[0]`): the word array and the per-word
    * hashes are computed once per row, then 64 bit-folds run over the
    * cached hash array.
    */
  def simhashExpr(wordsCol: String): Column = expr(
    s"""transform(array(transform($wordsCol, w -> xxhash64(w))), hs ->
       |  aggregate(
       |    transform(sequence(0, 63), b ->
       |      aggregate(hs, 0L,
       |        (acc, h) -> acc + if((shiftright(h, b) & 1L) = 1L, 1L, -1L))),
       |    0L,
       |    (packed, vote) -> shiftleft(packed, 1) | if(vote > 0L, 1L, 0L)))[0]""".stripMargin)

  /** Hamming distance between two packed 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block the 64-bit hash into 4×16-bit keys; any
    * pair within Hamming distance 3 shares at least one identical block
    * (pigeonhole), so bucketing by block is lossless for d <= 3 and the
    * shuffle key is 16 bits — no cross join.
    */
  def simhashPairs(
      docs: DataFrame, // (id, text)
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
  ): DataFrame = {
    val withWs = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__ws", TextAnalysis.words(col(textCol)))
      .select(col(idCol).as("id"), simhashExpr("__ws").as("sim"))
    // block b holds bits [16b, 16b+16)
    val blocked2 = withWs.select(col("id"), col("sim"),
      posexplode(expr("transform(sequence(0, 3), b -> (sim >> (b * 16)) & 65535)")))
      .withColumnsRenamed(Map("pos" -> "block", "col" -> "blockKey"))
    val l = blocked2.select(col("block"), col("blockKey"),
      col("id").as("idA"), col("sim").as("simA"))
    val r = blocked2.select(col("block"), col("blockKey"),
      col("id").as("idB"), col("sim").as("simB"))
    l.join(r, Seq("block", "blockKey")).where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), hamming(col("simA"), col("simB")).as("dist"))
      .distinct()
      .where(col("dist") <= maxHamming)
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index.
    * Shingles with document frequency > `maxDf` are dropped before the
    * self-join (hub-shingle guard). Fully SQL-expressible → DuckDB oracle.
    */
  def ngramJaccardPairs(
      docs: DataFrame, // (id, text)
      idCol: String,
      textCol: String,
      threshold: Double = 0.4,
      maxDf: Int = 50,
  ): DataFrame = {
    val docShingles = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        // join/df-prune on the 64-bit shingle hash, not the string: narrower
        // shuffle keys, cheaper equality (collision odds ~|shingles|²/2^64)
        explode(graft.functions.Exprs.let(TextAnalysis.words(col(textCol)),
          ws => transform(shingles(ws), s => xxhash64(s)))).as("sh"))
      .persist() // scanned three times: df-prune, index join, per-doc sizes
    val sizes = docShingles.groupBy("id").agg(count(lit(1)).as("nsh"))
    // one aggregation replaces df-count + index self-join: collect the
    // (sorted) doc list per shingle, drop hub shingles, and emit each
    // in-bucket pair once — pair structs come from a bounded (≤ maxDf)
    // in-memory list, so no wide shuffle join materializes
    val shared = docShingles
      .groupBy("sh").agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")).between(2, maxDf))
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a as idA, b as idB))))"))
        .as("p"))
      .groupBy(col("p.idA").as("idA"), col("p.idB").as("idB"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("idA"), col("nsh").as("nA")), "idA")
      .join(sizes.select(col("id").as("idB"), col("nsh").as("nB")), "idB")
      .select(col("idA"), col("idB"),
        round(col("shared").cast("double") /
          (col("nA") + col("nB") - col("shared")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs: exact cosine over LSH-bucketed candidates.
    * Random-hyperplane signs come from deterministic per-dimension hashes
    * (data-independent); docs sharing a sign-pattern bucket get verified
    * with the exact double-precision cosine.
    */
  def cosineNearDupPairs(
      emb: DataFrame, // (id, vec array<float/double>)
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 12,
  ): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val withVec = emb.select(col(idCol).as("id"), v.as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val bucketed = withVec.withColumn("bucket",
      Similarity.hyperplaneBucket(col("v"), planes))
    val l = bucketed.select(col("bucket"), col("id").as("idA"),
      col("v").as("vA"), col("nrm").as("nA"))
    val r = bucketed.select(col("bucket"), col("id").as("idB"),
      col("v").as("vB"), col("nrm").as("nB"))
    l.join(r, "bucket").where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        (Similarity.dot(col("vA"), col("vB")) / (col("nA") * col("nB"))).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
