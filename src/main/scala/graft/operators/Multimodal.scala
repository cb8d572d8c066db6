package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with a
  * typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition sizing, per-partition
  * batch shape (one codec context per partition, never per row), spill-safe
  * row sizes — and is what matters at 100 TB: media rows are large, so
  * `maxPartitionBytes`-sized scan splits and binary-aware shuffle avoidance
  * (operate map-side, join on ids only) are the design.
  *
  * The codec step itself is STUBBED with a deterministic fake (this
  * container has no image/audio libraries): `StubCodec` derives pixels /
  * samples from the bytes' rolling hash, so outputs are reproducible and
  * testable. Swap `StubCodec` for a real decoder (e.g. TwelveMonkeys /
  * javacv) without touching any Spark plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  case class MediaFrame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** STUB codec — deterministic byte-derived "decode". Marked clearly:
    * replace with a real library; signatures are the contract. */
  object StubCodec {
    /** Rolling-hash bytes → fixed-length float features (a real impl would
      * decode pixels / PCM and pool). Deterministic in the payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        out(math.abs((h % dim).toInt)) += (h % 17).toInt / 17.0f
        i += 1
      }
      out
    }

    /** "Resize": real impl re-encodes pixels; stub re-derives a payload of
      * the target size deterministically. */
    def resize(bytes: Array[Byte], w: Int, hgt: Int): Array[Byte] = {
      val out = new Array[Byte]((w.toLong * hgt % 4096).toInt.max(16))
      var h = 1125899906842597L ^ (w.toLong << 32 | hgt)
      var i = 0
      while (i < out.length) {
        h = 31 * h + (if (bytes.nonEmpty) bytes(i % bytes.length) else 0)
        out(i) = (h & 0xff).toByte
        i += 1
      }
      out
    }

    /** Frame sampling: real impl seeks keyframes; stub slices the payload
      * into `n` deterministic windows. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map { i =>
        val start = if (bytes.isEmpty) 0 else (i * bytes.length) / n
        val end = if (bytes.isEmpty) 0 else ((i + 1) * bytes.length) / n
        java.util.Arrays.copyOfRange(bytes, start, end.max(start))
      }
  }

  /** Deterministic synthetic media table (tests/demo — fixtures carry no
    * binary tables). Payload bytes are seeded by media_id. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 256 + (id % 512).toInt
      val bytes = new Array[Byte](len)
      var h = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < len) { h = h * 6364136223846793005L + 1442695040888963407L; bytes(i) = (h >>> 56).toByte; i += 1 }
      MediaRecord(id, kind,
        bytes,
        MediaMeta(Seq("png", "wav", "mp4")((id % 3).toInt), 64 + (id % 64).toInt, 64, id % 10000))
    }
  }

  /** Feature extraction: mapPartitions so a real codec is initialized once
    * per partition (the batch shape that matters), never per row. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map(m => MediaFeatures(m.media_id, m.kind, StubCodec.features(m.bytes, dim)))
    }
  }

  /** Resize images (other kinds pass through), meta updated consistently. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image")
          m.copy(bytes = StubCodec.resize(m.bytes, w, h), meta = m.meta.copy(width = w, height = h))
        else m
      }
    }
  }

  /** Frame sampling for video rows: one media row → n frame rows (the
    * multimodal analogue of the listing UDTF). */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      StubCodec.sampleFrames(m.bytes, n).zipWithIndex.map {
        case (b, i) => MediaFrame(m.media_id, i, b)
      }
    }
  }

  /** Join features back to metadata by id — binary stays where it was
    * produced; only ids and small features shuffle. */
  def featureTable(media: Dataset[MediaRecord], dim: Int = 16): DataFrame = {
    val feats = extractFeatures(media, dim)
    feats.toDF().join(
        media.toDF().select(col("media_id"), col("meta")), "media_id")
      .orderBy(col("media_id"))
  }
}
