package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch transforms.
  *
  * The actual codec calls are STUBBED (`decodeImageStub` — the image/audio
  * libraries are not in this container) behind a deterministic fake, but the
  * Spark-side plumbing is real and tested: schema contract, mapPartitions
  * batching (the Scala analogue of `mapInPandas` batch shape), partition
  * sizing, and the columnar metadata path. Swapping the stub for a real
  * decoder changes one function.
  */
object Multimodal {

  /** An opaque media asset row: the binary payload plus typed metadata. */
  final case class MediaAsset(
      assetId: Long,
      mediaType: String, // image | audio | video
      payload: Array[Byte],
      sourceUri: String,
  )

  /** Decoded features produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      assetId: Long,
      mediaType: String,
      nBytes: Int,
      width: Int,        // fake-decoded dimensions
      height: Int,
      checksum: Long,    // deterministic payload fold
      embedding: Array[Float], // fake feature vector (8 dims)
  )

  implicit val assetEnc: Encoder[MediaAsset] = Encoders.product[MediaAsset]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB for the real image decode (would call a codec library here).
    * Deterministic fake: dimensions and features derive from the payload
    * bytes, so tests are stable and the full pipeline is exercised.
    */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // real implementation: ImageIO/ffmpeg/... — not available in this env
    val n = payload.length
    val w = 64 + (n % 256)
    val h = 64 + ((n / 7) % 256)
    val feats = Array.tabulate(8)(i =>
      (payload.iterator.drop(i).foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 104729) / 104729.0f))
    (w, h, feats)
  }

  private def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 2147483647L)

  /** Batch decode: partition-local, batched like mapInPandas — each batch is
    * decoded together so a real codec could amortize model/handle setup.
    * No shuffle; scales linearly with input splits.
    */
  def decodeFeatures(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[MediaFeatures] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would init once per batch here
        batch.iterator.map { a =>
          val (w, h, feats) = decodeImageStub(a.payload)
          MediaFeatures(a.assetId, a.mediaType, a.payload.length, w, h,
            checksum(a.payload), feats)
        }
      }
    }

  /** A "resized" asset: target dimensions plus the transformed payload's
    * stats (the real op would re-encode; the stub derives them
    * deterministically so the plumbing is testable end-to-end).
    */
  final case class ResizedAsset(
      assetId: Long,
      width: Int,
      height: Int,
      nBytes: Int,     // 3 bytes/pixel stand-in for the re-encoded size
      checksum: Long,  // payload fold mixed with the target dims
  )

  implicit val resizedEnc: Encoder[ResizedAsset] = Encoders.product[ResizedAsset]

  /** Batched resize: partition-local like decodeFeatures (a real codec
    * would scale pixels per batch here). The stub keeps the Spark-side
    * contract real — schema, batch shape, determinism — and derives the
    * output stats from the payload + target dims:
    * checksum = (payloadChecksum * 31 + w * 131 + h) mod (2^31-1).
    */
  def resize(assets: Dataset[MediaAsset], width: Int, height: Int,
      batchSize: Int = 64): Dataset[ResizedAsset] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real resizer would init scaler state once per batch here
        batch.iterator.map { a =>
          val ck = (checksum(a.payload) * 31 + width * 131L + height) % 2147483647L
          ResizedAsset(a.assetId, width, height, width * height * 3, ck)
        }
      }
    }

  /** Frame-sampling stub for video payloads: every k-th chunk of the binary
    * stands in for a frame; real impl would demux containers.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int = 10,
      frameBytes: Int = 1024): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      a.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (a.assetId, idx, chunk.length, checksum(chunk)) }
    }.toDF("assetId", "frameIdx", "frameBytes", "frameChecksum")
  }

  /** Build a media-asset frame from any table with a text column — the
    * harness path used in tests/bench (payload = UTF-8 bytes standing in
    * for encoded media).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("assetId"),
      lit("image").as("mediaType"),
      encode(col(textCol), "UTF-8").as("payload"),
      concat(lit("synthetic://"), col(idCol)).as("sourceUri"))
      .as[MediaAsset]
  }
}
