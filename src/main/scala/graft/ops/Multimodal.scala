package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch transforms
  * (`mapPartitions` — the Scala analogue of `mapInPandas` batch shape).
  *
  * The IMAGE path is REAL: `javax.imageio` ships in the JDK
  * (`java.desktop` module) and decodes PNG/JPEG/GIF/BMP headless with no
  * external dependency, so `decodeFeatures`/`resize` on
  * `mediaType = "image"` run `ImageIO.read` over the actual payload bytes
  * and work on the decoded raster. The test fixtures are deterministic
  * PNGs ([[encodePng]]: pixel = an integer function of (x, y, assetId)),
  * which makes decoded dimensions and pixel checksums DuckDB-oracle-
  * expressible — the oracle recomputes the expected raster analytically,
  * so a wrong decode fails the hash gate.
  *
  * The AUDIO path is REAL too: `javax.sound.sampled` (same `java.desktop`
  * module) parses WAV/PCM containers headless, so `decodeFeatures` /
  * [[decodeAudioFeatures]] / [[sampleAudioWindows]] on
  * `mediaType = "audio"` run `AudioSystem.getAudioInputStream` over the
  * actual payload bytes and work on the decoded 16-bit samples. The test
  * fixtures are deterministic WAVs ([[encodeWav]]: sample(t) = an integer
  * function of (t, assetId)), so duration / energy / windowed checksums
  * are DuckDB-oracle-expressible — a wrong decode fails the hash gate.
  *
  * Only ffmpeg-class VIDEO demuxing is genuinely not in this container;
  * that media type falls back to a clearly-marked deterministic stub so
  * the batching/schema plumbing stays exercised end-to-end. Swapping the
  * stub for a real demuxer changes one function.
  */
object Multimodal {

  /** An opaque media asset row: the binary payload plus typed metadata. */
  final case class MediaAsset(
      assetId: Long,
      mediaType: String, // image | audio | video
      payload: Array[Byte],
      sourceUri: String,
  )

  /** Decoded features. For images, `width`/`height`/`checksum`/`embedding`
    * come from the REAL decoded raster; `nBytes` is the encoded payload
    * size (PNG container bytes — not analytically reproducible in SQL,
    * which is why the oracle projects the raster-derived columns).
    */
  final case class MediaFeatures(
      assetId: Long,
      mediaType: String,
      nBytes: Int,
      width: Int,
      height: Int,
      checksum: Long,          // row-major fold over decoded pixels (images)
      embedding: Array[Float], // 8-dim pixel-derived feature vector
  )

  implicit val assetEnc: Encoder[MediaAsset] = Encoders.product[MediaAsset]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  private val P31 = 2147483647L

  /** Deterministic fixture pixel at (x, y) of asset `id`, packed RGB.
    * Pure integer arithmetic so the DuckDB oracle recomputes the raster:
    * r = (7x+13y+id) mod 256, g = (11x+3y+5id) mod 256,
    * b = (5x+17y+11id) mod 256 — floorMod, so a negative id still yields
    * channels in [0,256) (Scala `%` would go negative and bleed shifted
    * bits across channels), matching the oracle's non-negative `%`/pmod.
    */
  def fixturePixel(id: Long, x: Int, y: Int): Long = {
    val r = Math.floorMod(x * 7L + y * 13L + id, 256)
    val g = Math.floorMod(x * 11L + y * 3L + id * 5L, 256)
    val b = Math.floorMod(x * 5L + y * 17L + id * 11L, 256)
    (r << 16) | (g << 8) | b
  }

  /** Encode the deterministic fixture image for `id` as a real PNG. */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, fixturePixel(id, x, y).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Row-major pixel checksum of a decoded image:
    * fold a = (a*31 + rgb(x,y)) mod (2^31-1), y outer, x inner.
    */
  private def rasterChecksum(img: java.awt.image.BufferedImage): Long = {
    var a = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        a = (a * 31 + (img.getRGB(x, y) & 0xffffff)) % P31
        x += 1
      }
      y += 1
    }
    a
  }

  /** 8-dim embedding from the decoded raster: dim i = mean packed-RGB of
    * pixels at row-major positions ≡ i (mod 8), normalized to [0,1].
    */
  private def rasterEmbedding(img: java.awt.image.BufferedImage): Array[Float] = {
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    var p = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sums(p % 8) += (img.getRGB(x, y) & 0xffffff).toDouble
        counts(p % 8) += 1
        p += 1; x += 1
      }
      y += 1
    }
    Array.tabulate(8)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 0xffffff).toFloat)
  }

  // ImageIO's DEFAULT ImageInputStream is FILE-cache-backed: every decode
  // creates (and deletes) a temp file in the shared cache directory, so a
  // 32-thread decode scan serializes on filesystem metadata — the same
  // at-scale convoy shape as the AudioSystem SPI registry below. The
  // payloads here are in-memory byte arrays; wrap each decode in an
  // explicit MemoryCacheImageInputStream instead. Scoped per call — NOT
  // the process-global ImageIO.setUseCache(false) toggle, which would
  // silently change stream semantics for every other ImageIO consumer in
  // a JVM embedding this library.
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload)))
    require(img != null, "payload is not a decodable image")
    img
  }

  // ======================= audio (REAL decode) =======================

  /** Deterministic fixture sample at time `t` of asset `id`: a full-range
    * signed 16-bit value, pure integer arithmetic so the DuckDB oracle
    * recomputes the waveform — s(t) = ((2029·t + 48271·id + 12345) mod
    * 65536) − 32768. floorMod for the same negative-id safety as
    * [[fixturePixel]]; identical to plain `%` for the non-negative
    * testdata ids the oracle mirrors.
    */
  def fixtureSample(id: Long, t: Int): Int =
    (Math.floorMod(t * 2029L + id * 48271L + 12345L, 65536L) - 32768L).toInt

  /** Encode the deterministic fixture waveform for `id` as a real WAV
    * container (RIFF header + 16-bit mono little-endian PCM), via the JDK
    * WAV writer — the decode side then has to parse a genuine container.
    */
  def encodeWav(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples > 0, s"nSamples must be positive: $nSamples")
    val data = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val s = fixtureSample(id, t)
      data(2 * t) = (s & 0xff).toByte
      data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL WAV decode: parse the container, require 16-bit mono
    * little-endian PCM, return (sampleRate, samples). The canonical
    * 44-byte RIFF layout (the JDK writer's, byte-pinned by the
    * m_media_frames_wav oracle) is parsed DIRECTLY; anything else routes
    * through `javax.sound.sampled`. The split exists because
    * `AudioSystem.getAudioInputStream` serializes every caller on the
    * global SPI provider registry — the r16 sf1.0 sweep measured a
    * 32-thread decode of 50k assets at 21 s vs 4.5 s on TWO threads
    * (lock convoy; this VM's ~63 µs context switches amplify it), which
    * is how a per-asset JDK facility becomes the scan bottleneck at
    * scale. A production decoder fast-paths its dominant container the
    * same way.
    */
  private def readWav(payload: Array[Byte]): (Int, Array[Short]) =
    readWavCanonical(payload).getOrElse(readWavJdk(payload))

  /** The canonical JDK RIFF/WAVE header, validated field by field:
    * "RIFF" + size(36+data) + "WAVE" + "fmt " + 16 + PCM(1) + mono(1) +
    * rate + byteRate + blockAlign(2) + 16 bits + "data" + dataLen.
    * Returns None on ANY deviation — the javax.sound path owns those.
    */
  private[graft] def readWavCanonical(p: Array[Byte]): Option[(Int, Array[Short])] = {
    @inline def le32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    @inline def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    @inline def tag(o: Int, s: String): Boolean =
      p(o) == s.charAt(0).toByte && p(o + 1) == s.charAt(1).toByte &&
        p(o + 2) == s.charAt(2).toByte && p(o + 3) == s.charAt(3).toByte
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE") ||
        !tag(12, "fmt ") || le32(16) != 16 || le16(20) != 1 ||
        le16(22) != 1 || le16(32) != 2 || le16(34) != 16 ||
        !tag(36, "data")) return None
    val rate = le32(24)
    val dataLen = le32(40)
    if (dataLen != p.length - 44 || le32(4) != 36 + dataLen ||
        le32(28) != rate * 2 || (dataLen & 1) != 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((p(44 + 2 * i) & 0xff) | (p(45 + 2 * i) << 8)).toShort
      i += 1
    }
    Some((rate, samples))
  }

  /** The `javax.sound.sampled` path (`java.desktop` module — headless,
    * zero external dependencies) for non-canonical containers.
    */
  private[graft] def readWavJdk(payload: Array[Byte]): (Int, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian && fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
        s"expected 16-bit mono little-endian signed PCM, got: $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = (((bytes(2 * i) & 0xff)) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, samples)
    } finally ais.close()
  }

  /** Amplitude checksum over decoded samples [from, until): the row-major
    * fold style of [[rasterChecksum]] with the sample biased to [0, 65536)
    * — a = (a·31 + (s+32768)) mod (2^31−1).
    */
  private def sampleChecksum(samples: Array[Short], from: Int, until: Int): Long = {
    var a = 0L
    var i = from
    while (i < until) {
      a = (a * 31 + (samples(i) + 32768L)) % P31
      i += 1
    }
    a
  }

  /** 8-dim audio embedding: dim i = mean biased amplitude of samples at
    * positions ≡ i (mod 8), normalized to [0,1] — the audio analogue of
    * [[rasterEmbedding]].
    */
  private def sampleEmbedding(samples: Array[Short]): Array[Float] = {
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    var i = 0
    while (i < samples.length) {
      sums(i % 8) += samples(i) + 32768.0
      counts(i % 8) += 1
      i += 1
    }
    Array.tabulate(8)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 65535.0).toFloat)
  }

  /** Decoded audio features — every column derives from the REAL decoded
    * sample stream: `durationMs = ⌊nSamples·1000/sampleRate⌋`, `sumSq` the
    * exact integer energy Σ s(t)² (fits a Long: 2³⁰ per sample), `rms` its
    * root mean square, `checksum` the ordered amplitude fold.
    */
  final case class AudioFeatures(
      assetId: Long,
      nBytes: Int,      // encoded container size (header + PCM)
      sampleRate: Int,
      nSamples: Int,
      durationMs: Long,
      sumSq: Long,
      rms: Double,
      checksum: Long,
  )

  implicit val audioEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** Batch audio decode: partition-local like [[decodeFeatures]], no
    * shuffle, REAL `AudioSystem` WAV parse per asset. Scales linearly with
    * input splits; a non-audio or undecodable payload raises rather than
    * silently stubbing.
    */
  def decodeAudioFeatures(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[AudioFeatures] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          require(a.mediaType == "audio", s"not audio: ${a.mediaType}")
          val (rate, samples) = readWav(a.payload)
          var sq = 0L
          var i = 0
          while (i < samples.length) {
            sq += samples(i).toLong * samples(i); i += 1
          }
          AudioFeatures(a.assetId, a.payload.length, rate, samples.length,
            samples.length * 1000L / rate, sq,
            if (samples.isEmpty) 0.0 else math.sqrt(sq.toDouble / samples.length),
            sampleChecksum(samples, 0, samples.length))
        }
      }
    }

  /** Window sampling over the DECODED audio stream — the media-domain
    * analogue of [[sampleFrames]], except the payload is a genuine WAV
    * container and the windows are real decoded samples, not raw payload
    * chunks: every `everyK`-th window of `windowSamples` samples, with the
    * window's ordered amplitude checksum. Partition-local flatMap, no
    * shuffle; fan-out ⌈n/windowSamples/everyK⌉ rows per asset.
    */
  def sampleAudioWindows(assets: Dataset[MediaAsset], windowSamples: Int = 256,
      everyK: Int = 1): DataFrame = {
    require(windowSamples > 0 && everyK > 0, s"bad window/$everyK args")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      require(a.mediaType == "audio", s"not audio: ${a.mediaType}")
      val (_, samples) = readWav(a.payload)
      val nWin = (samples.length + windowSamples - 1) / windowSamples
      (0 until nWin).iterator.filter(_ % everyK == 0).map { wi =>
        val from = wi * windowSamples
        val until = math.min(from + windowSamples, samples.length)
        (a.assetId, wi, until - from, sampleChecksum(samples, from, until))
      }
    }.toDF("assetId", "windowIdx", "nSamples", "windowChecksum")
  }

  /** Real-WAV audio assets derived from a documents frame: per doc a
    * deterministic fixture waveform sized from its stats —
    * nSamples = 512 + n_chars mod 512 (512..1023 at 8 kHz, cheap at any
    * SF) — encoded with the JDK WAV writer. Partition-local generation,
    * no shuffle; the decode side never sees anything but real WAV bytes.
    */
  def audioAssets(df: DataFrame, idCol: String = "doc_id",
      charsCol: String = "n_chars"): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        (lit(512) + pmod(col(charsCol), lit(512))).cast("int"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        MediaAsset(id, "audio", encodeWav(id, n), s"synthetic://wav/$id")
      })
  }

  /** STUB for video decode — ffmpeg-class demuxers are genuinely not in
    * this container (images and audio do NOT take this path:
    * `javax.imageio` and `javax.sound.sampled` are JDK-builtin, and
    * [[decodeFeatures]] decodes both for real). Deterministic fake:
    * dimensions and features derive from the payload bytes, so tests are
    * stable and the batching plumbing is exercised.
    */
  def decodeMediaStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 64 + (n % 256)
    val h = 64 + ((n / 7) % 256)
    val feats = Array.tabulate(8)(i =>
      (payload.iterator.drop(i).foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 104729) / 104729.0f))
    (w, h, feats)
  }

  private def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % P31)

  /** Batch decode: partition-local, batched like mapInPandas — each batch is
    * decoded together so codec/handle setup could amortize. No shuffle;
    * scales linearly with input splits. Images decode for REAL via
    * `ImageIO.read` (width/height/checksum/embedding from the raster);
    * audio decodes for REAL via `AudioSystem` (in this fixed-shape
    * surface `width` carries the sample rate and `height` the sample
    * count — [[decodeAudioFeatures]] is the typed audio surface); only
    * video falls back to [[decodeMediaStub]].
    */
  def decodeFeatures(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[MediaFeatures] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real video decoder would init once per batch here;
        // ImageIO readers / WAV parses are stateless
        batch.iterator.map { a =>
          if (a.mediaType == "image") {
            val img = readImage(a.payload)
            MediaFeatures(a.assetId, a.mediaType, a.payload.length,
              img.getWidth, img.getHeight, rasterChecksum(img),
              rasterEmbedding(img))
          } else if (a.mediaType == "audio") {
            val (rate, samples) = readWav(a.payload)
            MediaFeatures(a.assetId, a.mediaType, a.payload.length,
              rate, samples.length, sampleChecksum(samples, 0, samples.length),
              sampleEmbedding(samples))
          } else {
            val (w, h, feats) = decodeMediaStub(a.payload)
            MediaFeatures(a.assetId, a.mediaType, a.payload.length, w, h,
              checksum(a.payload), feats)
          }
        }
      }
    }

  /** A resized asset: target dimensions plus the resampled raster's
    * checksum (images — real pixels) or the deterministic stub stats
    * (audio/video thumbnails would need a demuxer).
    */
  final case class ResizedAsset(
      assetId: Long,
      width: Int,
      height: Int,
      nBytes: Int,     // 3 bytes/pixel of the resampled raster
      checksum: Long,
  )

  implicit val resizedEnc: Encoder[ResizedAsset] = Encoders.product[ResizedAsset]

  /** Batched resize. Images are decoded (`ImageIO.read`) and resampled
    * NEAREST-NEIGHBOR over the real raster — out(X, Y) = in(⌊X·w/W⌋,
    * ⌊Y·h/H⌋), the explicit integer mapping rather than Java2D's
    * interpolating `drawImage`, so the result is deterministic and the
    * DuckDB oracle can recompute the resampled checksum analytically.
    * Checksum = the same row-major fold as [[decodeFeatures]], over the
    * W×H output. Non-image media keeps the deterministic stub:
    * checksum = (payloadChecksum*31 + W*131 + H) mod (2^31-1).
    */
  def resize(assets: Dataset[MediaAsset], width: Int, height: Int,
      batchSize: Int = 64): Dataset[ResizedAsset] =
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          if (a.mediaType == "image") {
            val img = readImage(a.payload)
            val (w, h) = (img.getWidth, img.getHeight)
            var ck = 0L
            var yy = 0
            while (yy < height) {
              var xx = 0
              while (xx < width) {
                val px = img.getRGB(xx * w / width, yy * h / height) & 0xffffff
                ck = (ck * 31 + px) % P31
                xx += 1
              }
              yy += 1
            }
            ResizedAsset(a.assetId, width, height, width * height * 3, ck)
          } else {
            val ck = (checksum(a.payload) * 31 + width * 131L + height) % P31
            ResizedAsset(a.assetId, width, height, width * height * 3, ck)
          }
        }
      }
    }

  /** Byte-chunk frame sampling over RAW container bytes: every k-th
    * `frameBytes` chunk of the payload with its checksum. Format-agnostic
    * by design — over the WAV fixtures this samples genuine RIFF
    * container bytes (the `m_media_frames_wav` oracle reconstructs the
    * container byte-for-byte, header included); over video payloads the
    * chunks merely stand in for frames, because true frame extraction
    * needs an ffmpeg-class demuxer that is not in this environment.
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

  /** Real-PNG image assets derived from a documents frame: per doc a
    * deterministic fixture PNG sized from its stats —
    * w = 8 + n_chars mod 24, h = 8 + doc_id mod 24 (8..31 px, cheap at any
    * SF) — encoded with the JDK PNG writer. Partition-local generation,
    * no shuffle; the decode side never sees anything but real PNG bytes.
    */
  def imageAssets(df: DataFrame, idCol: String = "doc_id",
      charsCol: String = "n_chars"): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        (lit(8) + pmod(col(charsCol), lit(24))).cast("int"),
        (lit(8) + pmod(col(idCol), lit(24))).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) =>
        MediaAsset(id, "image", encodePng(id, w, h), s"synthetic://png/$id")
      })
  }

  // ================== image near-dup fingerprinting ==================

  /** Fixture pixel for the NEAR-DUP image fixture: groups of 4 asset ids
    * share a base raster — the [[graft.ops.Similarity.bandSign]]
    * two-modular-squares mix of the seed `1000003·(id/4) + 7919·x² +
    * 104729·y² + 54321` on the P31 line, low 24 bits as packed RGB
    * (every intermediate < 2⁶², so the oracle replays it in plain
    * BIGINT). The r16 sf1.0 sweep caught the previous form (channels
    * AFFINE in (x, y, g), like the audio sawtooth): its dHash grid
    * comparisons lived in a FIXED 1,217-shape space at every corpus
    * size, so cross-group pairs within Hamming 4 grew quadratically —
    * 4.17M pairs over 50k assets vs 39k over 5k. The squares decorrelate
    * groups (x²/y² also kill raster-shift alignment), so the pair set is
    * the planted families, linear in the corpus. The variant id%4 still
    * shifts the red channel by 8·variant in the left strip (x < 2) on
    * even rows only — a localized edit (re-encode artifact / small
    * overlay) confined to the first [[dhash64]] grid columns; cross-group
    * hashes measure ~32 bits apart. Pure integer arithmetic (floorMod)
    * so the DuckDB oracle recomputes the raster.
    */
  def nearDupPixel(id: Long, x: Int, y: Int): Long = {
    val s0 = (1000003L * (id / 4) + 7919L * x * x + 104729L * y * y +
      54321L) % P31
    val x1 = (s0 * s0) % P31
    val x2 = ((x1 + s0) * 48271L) % P31
    val base = ((x2 * x2) % P31) % 16777216L
    if (x < 2 && y % 2 == 0) {
      val r = Math.floorMod((base >> 16) + 8L * (id % 4), 256)
      (r << 16) | (base & 0xffff)
    } else base
  }

  /** Encode the near-dup fixture image for `id` as a real PNG. Dimensions
    * derive from the GROUP (id/4), so group members compare pixel-grids
    * of identical shape: w = 8 + (7·g + 3) mod 24, h = 8 + (13·g + 5)
    * mod 24.
    */
  def encodeNearDupPng(id: Long): Array[Byte] = {
    val g = id / 4
    val w = (8 + Math.floorMod(g * 7 + 3, 24)).toInt
    val h = (8 + Math.floorMod(g * 13 + 5, 24)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, nearDupPixel(id, x, y).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The near-dup PNG asset table: one real PNG per document id, planted
    * in groups of 4 near-identical variants (see [[nearDupPixel]]).
    * Partition-local generation, no shuffle.
    */
  def imageDedupAssets(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        MediaAsset(id, "image", encodeNearDupPng(id), s"synthetic://neardup/$id")
      })
  }

  /** dHash-64 perceptual fingerprint of a decoded raster (Krawetz's
    * difference hash): nearest-neighbor sample a 9×8 luminance grid —
    * sx = ⌊gx·w/9⌋, sy = ⌊gy·h/8⌋, lum = r+g+b (division-free: Hamming
    * only needs the ORDER of adjacent luminances) — then bit gy·8+gx is
    * set iff lum(gx,gy) < lum(gx+1,gy). Near-identical images (small
    * edits, re-encodes, brightness shifts) flip few bits; unrelated
    * images differ in ~32. The explicit integer sampling (same scheme as
    * [[resize]]) keeps the hash DuckDB-reproducible from the fixture's
    * closed-form pixels.
    */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val lum = Array.ofDim[Int](8, 9)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val rgb = img.getRGB(gx * w / 9, gy * h / 8)
        lum(gy)(gx) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (lum(gy)(gx) < lum(gy)(gx + 1)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** One-payload decode + fingerprint entry points — what the streaming
    * twin maps over arriving binary rows ([[graft.streaming.MediaStream]]).
    */
  def imageHash(payload: Array[Byte]): Long = dhash64(readImage(payload))
  def audioHash(payload: Array[Byte]): Long = audioFingerprint64(readWav(payload)._2)

  /** 64-bit chunk-energy fingerprint of an encoded VIDEO container — the
    * stub-decode tier (no ffmpeg-class codec in this container, per the
    * harness convention of [[decodeMediaStub]]/[[sampleFrames]]): the
    * payload's first 65·w bytes (w = n/65) are treated as 65 stub
    * "frames", each summarized by its unsigned-byte sum, and bit k is set
    * iff e(k) < e(k+1) — the same difference-hash shape as [[dhash64]] /
    * [[audioFingerprint64]], so the chunking, fingerprint, blocking, and
    * index plumbing are all REAL and a codec drop-in only replaces the
    * per-frame energy with a decoded-frame statistic.
    */
  def videoFingerprint64(payload: Array[Byte]): Long = {
    require(payload.length >= 65,
      s"videoFingerprint64 needs >= 65 payload bytes: ${payload.length}")
    val w = payload.length / 65
    val e = new Array[Long](65)
    var k = 0
    while (k < 65) {
      var s = 0L
      var t = k * w
      while (t < (k + 1) * w) { s += payload(t) & 0xff; t += 1 }
      e(k) = s
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (e(k) < e(k + 1)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Chunk-energy fingerprints of a video-asset table, shaped for
    * [[graft.ops.Dedup.pairsFromHash]]. Assets shorter than 65 bytes have
    * no 65-frame grid and are skipped.
    */
  def videoHashes(assets: Dataset[MediaAsset], batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.payload.length >= 65).mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        (a.assetId, videoFingerprint64(a.payload))
      })
    }.toDF("id", "sim")
  }

  /** Perceptual fingerprints of an image-asset table: decode each PNG for
    * REAL and project `(id, sim)` rows shaped for
    * [[graft.ops.Dedup.pairsFromHash]]'s pigeonhole blocking. Batched
    * partition-local decode like [[decodeFeatures]]; zero exchanges.
    */
  def imageHashes(assets: Dataset[MediaAsset], batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        (a.assetId, dhash64(readImage(a.payload)))
      })
    }.toDF("id", "sim")
  }

  // ================== audio near-dup fingerprinting ==================

  /** Fixture sample for the NEAR-DUP audio fixture: groups of 4 asset ids
    * share a base waveform — the [[graft.ops.Similarity.bandSign]]
    * two-modular-squares mix of the seed `1000003·(id/4) + 7919·t² +
    * 54321` on the P31 line (every intermediate < 2⁶², so the oracle
    * replays it in plain BIGINT), folded into int16 range. The r16 sf1.0
    * sweep caught the previous LINEAR form (a mod-65536 sawtooth): its
    * energy envelopes lived in a ~900-shape space, so CROSS-group
    * fingerprints collided within Hamming 4 QUADRATICALLY — 12.7M pairs
    * over 50k assets (exponent 1.31) — and an affine Lehmer remix did
    * not fix it (affine maps keep every group a constant mod-65536
    * translate of one progression; the bandSign v2 lesson again, this
    * time on the sample line). The squares break affinity: groups share
    * a seed phase only at ~2⁻³¹, and `t²` enters so no cross-group
    * time-shift alignment survives either. The variant id%4 bumps
    * amplitude by 512·variant on a sparse periodic mask (t mod 97 < 5 —
    * independent of the fingerprint's window layout) BEFORE the int16
    * fold, so a few samples per asset wrap the fold and flip a handful
    * of energy comparisons — a localized re-encode-style perturbation
    * (measured over the first 40 groups: within-group distance mean
    * 0.29, max 3 — 100% of planted pairs inside the operator's
    * maxHamming 4 — cross-group min 19, mean 32.0).
    */
  def nearDupSample(id: Long, t: Int): Int = {
    val P31 = 2147483647L
    val s0 = (1000003L * (id / 4) + 7919L * t.toLong * t + 54321L) % P31
    val x1 = (s0 * s0) % P31
    val x2 = ((x1 + s0) * 48271L) % P31
    val x3 = (x2 * x2) % P31
    val bump = if (t % 97 < 5) 512L * (id % 4) else 0L
    (Math.floorMod(x3 + bump, 65536L) - 32768L).toInt
  }

  /** Encode the near-dup fixture waveform for `id` as a real WAV. Length
    * derives from the GROUP: nSamples = 65 · (10 + (id/4) mod 8), so
    * group members compare equal window grids.
    */
  def encodeNearDupWav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
    val nSamples = (65L * (10 + Math.floorMod(id / 4, 8))).toInt
    val data = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val s = nearDupSample(id, t)
      data(2 * t) = (s & 0xff).toByte
      data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The near-dup WAV asset table — the audio sibling of
    * [[imageDedupAssets]]. Partition-local generation, no shuffle.
    */
  def audioDedupAssets(df: DataFrame, idCol: String = "doc_id"): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        MediaAsset(id, "audio", encodeNearDupWav(id), s"synthetic://neardupwav/$id")
      })
  }

  /** 64-bit energy-difference fingerprint of a decoded waveform — the
    * audio analogue of [[dhash64]] (Haitsma-Kalker-style band-energy
    * differences, collapsed to the time axis): split the first 65·w
    * samples into 65 equal windows (w = n/65), take each window's
    * absolute-amplitude sum (EXACT integer arithmetic — no float
    * boundary for the oracle), and set bit k iff e(k) < e(k+1).
    * Amplitude-shift and re-encode perturbations flip few comparisons;
    * unrelated waveforms differ in ~32 bits.
    */
  def audioFingerprint64(samples: Array[Short]): Long = {
    require(samples.length >= 65,
      s"audioFingerprint64 needs >= 65 samples: ${samples.length}")
    val w = samples.length / 65
    val e = new Array[Long](65)
    var k = 0
    while (k < 65) {
      var s = 0L
      var t = k * w
      while (t < (k + 1) * w) { s += math.abs(samples(t).toLong); t += 1 }
      e(k) = s
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (e(k) < e(k + 1)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Audio fingerprints of a WAV-asset table: decode each container for
    * REAL and project `(id, sim)` rows shaped for
    * [[graft.ops.Dedup.pairsFromHash]] — the audio sibling of
    * [[imageHashes]]. Batched partition-local decode; zero exchanges.
    */
  def audioHashes(assets: Dataset[MediaAsset], batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        (a.assetId, audioFingerprint64(readWav(a.payload)._2))
      })
    }.toDF("id", "sim")
  }

  /** Build a media-asset frame from any table with a text column — the
    * video-ish harness path used by frame sampling and the stub decode
    * (payload = UTF-8 bytes standing in for an encoded container).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaAsset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("assetId"),
      lit("video").as("mediaType"),
      encode(col(textCol), "UTF-8").as("payload"),
      concat(lit("synthetic://"), col(idCol)).as("sourceUri"))
      .as[MediaAsset]
  }
}
