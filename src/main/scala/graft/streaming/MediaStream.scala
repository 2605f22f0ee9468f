package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Multimodal}

/** Streaming twins for the multimodal fingerprint operators: a stream of
  * ENCODED media assets (binary payloads) is decoded for real per
  * micro-batch, fingerprinted with the batch kernels
  * ([[graft.ops.Multimodal.dhash64]] / `audioFingerprint64`), and probed
  * against a static corpus fingerprint index — the
  * `nearDupsAgainstCorpus` convention at 64-bit width. The decode is
  * stateless and partition-local; the only state is the watermark-bounded
  * multi-block-collision collapse.
  */
object MediaStream {

  val assetSchema: StructType = StructType(Seq(
    StructField("assetId", LongType),
    StructField("mediaType", StringType),
    StructField("payload", BinaryType),
    StructField("sourceUri", StringType)))

  /** File-source stream over a directory of media-asset parquet files,
    * ingest-time-stamped like [[DocumentStream.read]].
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream.schema(assetSchema).parquet(dir)
      .withColumn("ingestTs", current_timestamp())

  /** ONE fingerprint-mapper definition for all three modalities. Unlike
    * the batch tables (where a bad payload raising IS the contract —
    * OpsSpec pins it), a stream must not wedge: a poison asset that
    * throws inside mapPartitions kills the query, and the file source
    * re-reads the same file on restart — a PERMANENT crash loop. So the
    * streaming mappers wrap the decode in Try and DROP undecodable /
    * too-short payloads (the dropped row is the one that could never
    * fingerprint anyway).
    */
  private def fingerprints(assets: DataFrame,
      hash: Array[Byte] => Long): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    // a null assetId would crash the non-nullable Long encoder BEFORE the
    // Try below runs — the exact permanent crash loop this wrapper exists
    // to prevent (the file source re-reads the poison file on restart).
    // Same drop rule as an undecodable payload: a row with no identity
    // can never serve a fingerprint
    assets.where(col("assetId").isNotNull)
      .select(col("assetId").cast("long"), col("payload"), col("ingestTs"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, p, ts) =>
        scala.util.Try(hash(p)).toOption.map(h => (id, h, ts))
      })
      .toDF("id", "sim", "ingestTs")
  }

  /** dHash-64 fingerprints of arriving image assets — REAL `ImageIO`
    * decode per row, `(id, sim, ingestTs)` out. Stateless.
    */
  def imageFingerprints(assets: DataFrame): DataFrame =
    fingerprints(assets, Multimodal.imageHash)

  /** Energy fingerprints of arriving audio assets — REAL `AudioSystem`
    * container parse per row. Stateless.
    */
  def audioFingerprints(assets: DataFrame): DataFrame =
    fingerprints(assets, Multimodal.audioHash)

  /** Chunk-energy fingerprints of arriving video assets (stub decode
    * tier — [[graft.ops.Multimodal.videoFingerprint64]]). Stateless;
    * sub-65-byte payloads have no frame grid and are dropped.
    */
  def videoFingerprints(assets: DataFrame): DataFrame =
    fingerprints(assets, Multimodal.videoFingerprint64)

  /** Streaming media near-dup probe: fingerprint rows `(id, sim,
    * ingestTs)` against a static [[graft.ops.Dedup.hashIndex]]. Emits
    * (id, corpusId, dist) for dist ≤ maxHamming; the probe is the ONE
    * shared definition (`Dedup.hashIndexMatchCore`), only the
    * watermark-bounded collision collapse is streaming-specific.
    *
    * `broadcastIndex` is OPT-IN (default false): the accumulated corpus
    * index grows without bound in steady state and can dwarf any
    * micro-batch, so forcing it to the build side would eventually OOM
    * the driver — the batch twin `hashIndexMatches` makes the same
    * choice. Leave it false to let the planner/AQE pick sides per
    * micro-batch; set true ONLY when the index is known small (say
    * ≤ a few hundred MB of (id, fingerprint) rows — a bounded
    * allow-list, not a crawl corpus).
    */
  def mediaNearDupsAgainstCorpus(fingerprints: DataFrame, index: DataFrame,
      maxHamming: Int = 4, blocks: Int = 5, bits: Int = 64,
      dedupDelay: String = "10 minutes",
      broadcastIndex: Boolean = false): DataFrame =
    Dedup.hashIndexMatchCore(fingerprints,
        if (broadcastIndex) broadcast(index) else index,
        maxHamming, blocks, bits)
      .select(col("id"), col("ingestTs"), col("corpusId"), col("dist"))
      .withWatermark("ingestTs", dedupDelay)
      .dropDuplicatesWithinWatermark("id", "corpusId")
      .drop("ingestTs")
}
