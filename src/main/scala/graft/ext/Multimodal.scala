package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §7.9): image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extract /
  * frame-sample stages.
  *
  * The decode step is STUBBED — this container has no codec libraries —
  * with a clearly-marked deterministic fake ([[FakeCodec]]). Everything
  * Spark-side is real: the schema, the per-partition batch iteration
  * (decoder initialized once per partition, the same pattern a Pandas-UDF
  * `mapInPandas` or a JNI codec binding would use), and the
  * narrow/no-shuffle plan shape.
  */
object Multimodal {

  /** One media asset: payload is the opaque blob. */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (what a real codec would surface). */
  case class MediaMeta(asset_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, sample_rate_hz: Int)

  /** Feature vector extracted per asset (fixed 8-dim here). */
  case class MediaFeatures(asset_id: Long, features: Array[Float])

  /** STUB CODEC — deterministic fake standing in for image/audio/video
    * decoding. Derives pseudo-metadata purely from the byte content so
    * tests are reproducible. A real deployment swaps this object for a
    * JNI/av-library binding with the same per-partition lifecycle. */
  object FakeCodec {
    /** "Expensive" init, once per partition (like avcodec_open). */
    def open(): FakeCodec = new FakeCodec
  }
  final class FakeCodec {
    def decode(a: MediaAsset): MediaMeta = {
      val n = a.payload.length
      val sum = { var s = 0; var i = 0; while (i < n) { s += a.payload(i) & 0xff; i += 1 }; s }
      a.kind match {
        case "image" => MediaMeta(a.asset_id, a.kind, n, 64 + sum % 1856, 64 + (sum / 7) % 1016, 1, 0)
        case "audio" => MediaMeta(a.asset_id, a.kind, n, 0, 0, 0, Seq(16000, 22050, 44100)(sum % 3))
        case _       => MediaMeta(a.asset_id, a.kind, n, 320 + sum % 1600, 240 + (sum / 3) % 840, 1 + sum % 300, 0)
      }
    }
    /** Fake 8-dim feature: byte histogram folded into 8 buckets, L1-normalized. */
    def features(a: MediaAsset): MediaFeatures = {
      val buckets = new Array[Float](8)
      a.payload.foreach(b => buckets((b & 0xff) % 8) += 1f)
      val total = math.max(a.payload.length, 1).toFloat
      MediaFeatures(a.asset_id, buckets.map(_ / total))
    }
  }

  /** Synthesize a media-asset table from the documents fixture: the text
    * bytes become the opaque payload (shape-realistic, content-fake). */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }

  /** Decode stage: per-partition batch iteration — decoder opened once
    * per partition, streamed over the iterator (no materialization of the
    * whole partition; safe for huge blobs). Narrow: zero shuffle. */
  def decode(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = FakeCodec.open()
      it.map(codec.decode)
    }
  }

  /** Feature-extract stage, same per-partition batch pattern. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = FakeCodec.open()
      it.map(codec.features)
    }
  }

  /** Frame-sample stage: 1 row per sampled frame (video only), every
    * `stride`-th frame — a generator (explode) over decoded metadata. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.toDF()
      .where(col("kind") === "video" && col("n_frames") > 0)
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

  // ----- REAL JVM codec (round 7): images and audio decode with ZERO
  // external dependencies — `javax.imageio` ships PNG/BMP/GIF/JPEG and
  // `javax.sound.sampled` ships WAV/PCM in every JDK. Only VIDEO keeps
  // the honest stub (no JVM-built-in video codec exists). -----

  /** Decoded row with a quarantine column: a corrupt payload NEVER
    * fails the job — it lands with `error` set (the JSONL-quarantine
    * discipline applied to media). */
  case class MediaDecoded(asset_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Long, sample_rate_hz: Int,
      error: String)

  /** Per-asset 64-bit average-hash (aHash): 8×8 nearest-neighbor
    * grayscale thumbnail, bit i set iff pixel i's gray EXCEEDS the
    * integer mean — the standard perceptual fingerprint for image
    * near-dup at corpus scale. Deterministic: integer grayscale
    * (299r+587g+114b)/1000, floor sampling coordinates, strict
    * compare. */
  case class ImageHash(asset_id: Long, ahash: Long)

  final class JvmCodec {
    import java.io.ByteArrayInputStream

    def decode(a: MediaAsset): MediaDecoded = {
      val n = a.payload.length
      a.kind match {
        case "image" =>
          try {
            val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(a.payload))
            if (img == null)
              MediaDecoded(a.asset_id, a.kind, n, 0, 0, 0, 0, "undecodable image")
            else
              MediaDecoded(a.asset_id, a.kind, n, img.getWidth, img.getHeight, 1, 0, null)
          } catch { case e: Exception =>
            MediaDecoded(a.asset_id, a.kind, n, 0, 0, 0, 0, s"image: ${e.getMessage}")
          }
        case "audio" =>
          try {
            val in = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new ByteArrayInputStream(a.payload))
            try {
              val f = in.getFormat
              MediaDecoded(a.asset_id, a.kind, n, 0, 0, in.getFrameLength,
                math.round(f.getSampleRate), null)
            } finally in.close()
          } catch { case e: Exception =>
            MediaDecoded(a.asset_id, a.kind, n, 0, 0, 0, 0, s"audio: ${e.getMessage}")
          }
        case other =>
          MediaDecoded(a.asset_id, other, n, 0, 0, 0, 0,
            s"no JVM codec for kind '$other'")
      }
    }

    /** 8×8 grayscale thumbnail as 64 ints in [0, 255] — nearest-neighbor
      * sampling (floor coords), integer luma. Also the 64-dim thumbnail
      * feature vector for the embedding operators. */
    def thumbnail8(img: java.awt.image.BufferedImage): Array[Int] = {
      val out = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = x * img.getWidth / 8
          val sy = y * img.getHeight / 8
          val rgb = img.getRGB(sx, sy)
          val gray = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          out(y * 8 + x) = gray
          x += 1
        }
        y += 1
      }
      out
    }

    def aHash(a: MediaAsset): Option[ImageHash] =
      try {
        val img = javax.imageio.ImageIO.read(
          new ByteArrayInputStream(a.payload))
        if (img == null || img.getWidth < 8 || img.getHeight < 8) None
        else {
          val t = thumbnail8(img)
          val mean = t.sum / 64
          var h = 0L
          var i = 0
          while (i < 64) { if (t(i) > mean) h |= (1L << i); i += 1 }
          Some(ImageHash(a.asset_id, h))
        }
      } catch { case _: Exception => None }

    /** WAV frame-sample: every `stride`-th PCM frame's first channel as
      * a float in [−1, 1] (16-bit signed little-endian assumed — the
      * canonical WAV PCM layout). */
    def sampleAudio(a: MediaAsset, stride: Int): Array[Float] =
      try {
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(a.payload))
        try {
          val f = in.getFormat
          val frameSize = f.getFrameSize
          val bytes = in.readAllBytes()
          val n = bytes.length / frameSize
          val out = scala.collection.mutable.ArrayBuffer.empty[Float]
          var i = 0
          while (i < n) {
            val off = i * frameSize
            val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            out += s / 32768f
            i += stride
          }
          out.toArray
        } finally in.close()
      } catch { case _: Exception => Array.empty[Float] }
  }

  /** Real decode stage — same per-partition lifecycle as the stub path
    * ([[decode]]), but through the JDK codecs; corrupt payloads
    * quarantine instead of failing. Narrow, zero shuffle. */
  def decodeJvm(assets: Dataset[MediaAsset]): Dataset[MediaDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = new JvmCodec
      it.map(codec.decode)
    }
  }

  /** Perceptual-hash image near-dup — the production image-dedup shape
    * on pure JDK decode: aHash per image (narrow), then the
    * simhash-style BANDED candidate join (four 16-bit bands of the
    * 64-bit hash; two images within Hamming distance d share ≥ one
    * band whenever d ≤ 3 — pigeonhole over 4 bands), exact popcount
    * verify on candidates only. Never an all-pairs product. */
  def imageNearDup(assets: Dataset[MediaAsset], maxHamming: Int = 3)
      : DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band LSH guarantees completeness only for maxHamming <= 3, got $maxHamming")
    import assets.sparkSession.implicits.newProductEncoder
    val hashes = assets.mapPartitions { it =>
      val codec = new JvmCodec
      it.flatMap(codec.aHash)
    }.toDF("asset_id", "ahash").persistScoped
    val bands = hashes.select(col("asset_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL)))
            .as("key"))): _*)).as("bk"))
      .select(col("asset_id"), col("ahash"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
