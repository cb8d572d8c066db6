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
  * The IMAGE path is real: `ImageIoCodec` decodes/encodes PNG via
  * `javax.imageio` (JDK-native, no external dependency) — synthesized
  * image rows carry genuine PNG payloads, features are pixel-luminance
  * histograms, resize re-samples and re-encodes actual pixels. The AUDIO
  * path is real too: `WavCodec` decodes/encodes WAV PCM via
  * `javax.sound.sampled.AudioSystem` (also JDK-native) — synthesized audio
  * rows carry genuine RIFF/WAVE payloads, features are RMS + zero-crossing
  * rate + Goertzel band energies over the decoded samples. The VIDEO path
  * is real as of round 7: `AviMjpegCodec` writes and parses MJPEG-in-AVI
  * (every frame an independent baseline JPEG inside a hand-rolled RIFF
  * container — both public formats, JPEG coding via `javax.imageio`, so
  * still JDK-only); frame sampling decodes genuine frames, video features
  * pool per-frame luminance histograms. Inter-frame codecs (H.264 etc.)
  * have no JDK implementation — swap a library decoder (javacv etc.)
  * behind the same seam without touching any Spark plumbing. A payload
  * that does not decode (foreign bytes) falls back to the deterministic
  * `StubCodec` rather than failing the task — the PERMISSIVE stance every
  * graft source takes.
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

  /** Real PNG codec on `javax.imageio` — no dependency beyond the JDK.
    * Everything is deterministic: the default PNG writer emits no
    * timestamp chunks, so encode(decode(x)) is stable across runs. */
  object ImageIoCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // r19 optimization: ImageIO defaults to DISK-backed stream caches
    // (getUseCache=true) — every encode/decode creates and deletes a temp
    // file. Harmless single-threaded; under 32 concurrent codec tasks the
    // tmp-dir churn serializes the whole stage (measured on q371: per-image
    // decode 0.3 ms → 7 ms at 32 threads). Memory-cached streams are the
    // documented alternative for byte-array-sized payloads; output bytes
    // are identical.
    ImageIO.setUseCache(false)

    /** Deterministic seeded RGB pattern → real PNG bytes. */
    def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var s = seed * 6364136223846793005L + 1442695040888963407L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          s = s * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, ((s >>> 40) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      toPng(img)
    }

    def toPng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** None when the bytes are not a decodable image — callers fall back
      * to the stub instead of failing the task. */
    def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Pixel features: luminance histogram over `dim` bins, normalized by
      * pixel count — a real (if simple) image descriptor. */
    def features(img: BufferedImage, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val n = img.getWidth * img.getHeight
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
          out((lum * dim) / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < dim) { out(i) /= n; i += 1 }
      out
    }

    /** Real resample (Graphics2D draw into the target raster) + re-encode. */
    def resizePng(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
      toPng(dst)
    }
  }

  /** Real WAV PCM codec on `javax.sound.sampled` — no dependency beyond the
    * JDK. 16-bit signed mono little-endian PCM; `AudioSystem.write` emits a
    * canonical RIFF header with no timestamps, so encode/decode round-trips
    * are stable across runs.
    */
  object WavCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}

    val SampleRate = 8000f

    // r19 optimization: AudioSystem.write / getAudioInputStream resolve
    // their SPI providers through JDK13Services.getProviders — a
    // SYNCHRONIZED static that re-runs ServiceLoader discovery on every
    // call. Under 32 concurrent codec tasks that global lock serialized
    // the stage (measured on q286: 0.19 ms/clip single-threaded → 4.5 ms
    // at 32 threads). Load the SAME provider objects once via the public
    // ServiceLoader SPI and call them directly — identical codec classes
    // (com.sun.media.sound.WaveFileWriter/Reader), identical bytes, no
    // per-call global lock. Lists are materialized eagerly inside the
    // lazy-val init so iteration is thread-safe afterwards.
    private lazy val fileWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala.toList
    }
    private lazy val fileReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      val all = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toList
      // WAVE reader first: ServiceLoader order puts SoftMidiAudioFileReader
      // ahead of WaveFileReader, and its sniff calls MidiSystem.getSequence
      // → the same synchronized JDK13Services lock per probe (thread-dump
      // verified). Every payload here is RIFF/WAVE, so probing Wave first
      // keeps the hot path lock-free; the rest stay as fallbacks.
      val (wave, rest) = all.partition(_.getClass.getSimpleName.startsWith("Wave"))
      wave ++ rest
    }

    /** AudioSystem.write(…, WAVE, out) minus the per-call synchronized
      * provider re-scan: first provider supporting WAVE for this stream. */
    private def writeWave(ais: AudioInputStream, out: ByteArrayOutputStream): Unit =
      fileWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais)) match {
        case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, out)
        case None => throw new IllegalStateException("no WAVE AudioFileWriter provider")
      }

    /** AudioSystem.getAudioInputStream(stream) minus the per-call
      * synchronized provider re-scan: first provider that accepts. */
    private def readAudio(in: ByteArrayInputStream): AudioInputStream = {
      val it = fileReaders.iterator
      while (it.hasNext) {
        try return it.next().getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            in.reset() // the provider may have consumed; restart for the next
        }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "Stream of unsupported format")
    }

    /** Deterministic seeded tone-plus-noise signal → real WAV bytes. The
      * two mixed tones land in different Goertzel bands so band energies
      * are a meaningful descriptor, not flat noise. */
    def encodeWav(nSamples: Int, seed: Long): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      val f1 = 200.0 + (seed % 7) * 150.0   // 200..1100 Hz
      val f2 = 1500.0 + (seed % 5) * 400.0  // 1500..3100 Hz
      var s = seed * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < nSamples) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val noise = ((s >>> 40).toInt & 0xffff) / 65535.0 - 0.5
        val t = i / SampleRate
        val v = 0.5 * math.sin(2 * math.Pi * f1 * t) +
          0.3 * math.sin(2 * math.Pi * f2 * t) + 0.1 * noise
        val sample = (v * Short.MaxValue).toInt.max(Short.MinValue).min(Short.MaxValue)
        pcm(2 * i) = (sample & 0xff).toByte          // little-endian
        pcm(2 * i + 1) = ((sample >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new ByteArrayOutputStream()
      try writeWave(ais, bos) finally ais.close()
      bos.toByteArray
    }

    /** Caller-supplied 16-bit PCM samples → real WAV bytes (same canonical
      * RIFF path as [[encodeWav]]) — the entry declared queries use to
      * encode CLOSED-FORM integer signals the oracle can re-derive. */
    def toWav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      try writeWave(ais, bos) finally ais.close()
      bos.toByteArray
    }

    /** None when the bytes are not decodable 16-bit PCM WAV — callers fall
      * back to the stub instead of failing the task. Returns samples
      * normalized to [-1, 1] (first channel if multi-channel). */
    def tryDecode(bytes: Array[Byte]): Option[Array[Float]] =
      try {
        val ais = readAudio(new ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
          else {
            val raw = ais.readAllBytes()
            val ch = fmt.getChannels
            val stride = 2 * ch
            val n = raw.length / stride
            val out = new Array[Float](n)
            val big = fmt.isBigEndian
            var i = 0
            while (i < n) {
              val lo = raw(i * stride + (if (big) 1 else 0)) & 0xff
              val hi = raw(i * stride + (if (big) 0 else 1))
              out(i) = ((hi << 8) | lo).toShort / 32768.0f
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch { case _: Exception => None }

    /** PCM features: [rms, zero-crossing rate, band energies...] — `dim - 2`
      * Goertzel filters at band centers spread over (0, Nyquist). A real
      * (if simple) audio descriptor over genuinely decoded samples.
      * Permissive on `dim` like the other codecs: dims too small for a
      * slot simply omit it (dim=1 → RMS only; dim=0 → empty) instead of
      * throwing from an executor task. */
    def features(samples: Array[Float], dim: Int): Array[Float] = {
      val out = new Array[Float](math.max(dim, 0))
      val n = samples.length
      if (n == 0 || dim <= 0) return out
      var sumSq = 0.0
      var zc = 0
      var i = 0
      while (i < n) {
        sumSq += samples(i).toDouble * samples(i)
        if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      out(0) = math.sqrt(sumSq / n).toFloat
      if (dim > 1) out(1) = zc.toFloat / n
      val bands = dim - 2
      var b = 0
      while (b < bands) {
        // Goertzel power at the band-center frequency, normalized by n² —
        // a coherent tone's |sum|² grows as n², so /n² makes band energy
        // length-invariant (matching the already length-invariant RMS and
        // ZCR); the previous /n scaled linearly with clip duration, making
        // identical signals of different lengths look dissimilar.
        val freq = (b + 0.5) * (SampleRate / 2.0) / bands
        val coeff = 2.0 * math.cos(2 * math.Pi * freq / SampleRate)
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var j = 0
        while (j < n) {
          s0 = samples(j) + coeff * s1 - s2
          s2 = s1; s1 = s0
          j += 1
        }
        out(2 + b) = ((s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n)).toFloat
        b += 1
      }
      out
    }
  }

  /** Real VIDEO codec — MJPEG-in-AVI on `javax.imageio`, no dependency
    * beyond the JDK. The JDK ships no inter-frame video codec, but MJPEG
    * (Motion JPEG: every frame an independent baseline JPEG) needs only
    * the JPEG coder the JDK already has, plus the AVI/RIFF container,
    * which is a public, fully-documented byte format (RIFF chunks:
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' '00dc'*))`) — hand-rolled here in ~100 lines.
    *
    * The encoder emits a well-formed single-stream 'vids'/'MJPG' AVI
    * (56-byte avih, 56-byte strh, 40-byte BITMAPINFOHEADER strf,
    * word-aligned frame chunks); the decoder is a permissive RIFF walker
    * that collects `##dc`/`##db` chunk bodies under LIST 'movi' and
    * JPEG-decodes each, returning None on foreign bytes (the StubCodec
    * fallback stance). JPEG is lossy, so features operate on the DECODED
    * pixels — exactly the contract a real pipeline has. */
  object AviMjpegCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    val Fps = 10

    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** RIFF chunk: fourcc + LE size + body, padded to word alignment. */
    private def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    private def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)

    def toJpeg(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Deterministic seeded moving-gradient frames (smooth content JPEG
      * compresses meaningfully, shifted per frame so motion exists) →
      * real MJPEG-AVI bytes. */
    def encodeAvi(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val p = ((seed % 97) + 3).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = (x * p + f * 11) & 0xff
            val g = (y * p + f * 7) & 0xff
            val b = ((x + y) * 3 + f * 13) & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        toJpeg(img)
      }
      val avih = chunk("avih",
        le32(1000000 / Fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
          le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
          le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val strh = chunk("strh",
        fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
          le32(0) ++ le32(1) ++ le32(Fps) ++ le32(0) ++ le32(nFrames) ++
          le32(frames.map(_.length).max) ++ le32(-1) ++ le32(0) ++
          le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      val strf = chunk("strf",
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
          fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
          le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi", frames.toArray.flatMap(jf => chunk("00dc", jf)))
      val body = fcc("AVI ") ++ hdrl ++ movi
      fcc("RIFF") ++ le32(body.length) ++ body
    }

    private def rdLe32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** None when the bytes are not a parseable MJPEG-AVI — callers fall
      * back to the stub instead of failing the task. Walks the RIFF tree
      * permissively: any `##dc`/`##db` chunk body that JPEG-decodes is a
      * frame; truncated/garbled trailing chunks end the walk, they don't
      * throw. */
    def tryDecodeFrames(bytes: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
      try {
        if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
            fourcc(bytes, 8) != "AVI ") None
        else {
          val acc = IndexedSeq.newBuilder[BufferedImage]
          def walk(start: Int, end: Int): Unit = {
            var o = start
            while (o + 8 <= end) {
              val id = fourcc(bytes, o)
              val sz = rdLe32(bytes, o + 4)
              val bodyStart = o + 8
              if (sz < 0 || bodyStart + sz > end) return // truncated: stop
              if (id == "LIST") walk(bodyStart + 4, bodyStart + sz)
              else if (id.endsWith("dc") || id.endsWith("db")) {
                // per-frame isolation: one garbled frame skips, the
                // intact ones still decode
                val img =
                  try ImageIO.read(new ByteArrayInputStream(
                    java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + sz)))
                  catch { case _: Exception => null }
                if (img != null) acc += img
              }
              o = bodyStart + sz + (sz % 2) // word alignment
            }
          }
          // clamp to the real array: a truncated file's RIFF header still
          // advertises the original size
          walk(12, math.min(12 + rdLe32(bytes, 4) - 4, bytes.length))
          val frames = acc.result()
          if (frames.nonEmpty) Some(frames) else None
        }
      } catch { case _: Exception => None }

    /** Video features: the temporal MEAN of per-frame luminance histograms
      * (each frame's histogram sums to 1, so the pooled descriptor does
      * too) — comparable with the image descriptor by construction. */
    def features(frames: Seq[BufferedImage], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      frames.foreach { img =>
        val h = ImageIoCodec.features(img, dim)
        var i = 0
        while (i < dim) { out(i) += h(i); i += 1 }
      }
      var i = 0
      while (i < dim) { out(i) /= frames.size.max(1); i += 1 }
      out
    }
  }

  /** Deterministic synthetic media table (tests/demo — fixtures carry no
    * binary tables). Image rows carry REAL PNG payloads (decodable with any
    * PNG reader); audio rows carry REAL WAV PCM payloads (decodable with
    * any WAV reader); video rows carry REAL MJPEG-AVI payloads (decodable
    * with any AVI-aware player). */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val w = 64 + (id % 64).toInt
      val nSamples = 800 + (id % 800).toInt // 100–200 ms at 8 kHz
      val nFrames = 4 + (id % 4).toInt
      val bytes = kind match {
        case "image" => ImageIoCodec.encodePng(w, 64, id)
        case "audio" => WavCodec.encodeWav(nSamples, id)
        case _ => AviMjpegCodec.encodeAvi(32 + (id % 16).toInt * 2, 24, nFrames, id)
      }
      val durationMs = kind match {
        case "audio" => (nSamples * 1000L) / WavCodec.SampleRate.toLong
        case "video" => nFrames * 1000L / AviMjpegCodec.Fps
        case _ => 0L
      }
      MediaRecord(id, kind, bytes,
        MediaMeta(Seq("png", "wav", "avi")((id % 3).toInt),
          if (kind == "video") 32 + (id % 16).toInt * 2 else w,
          if (kind == "video") 24 else 64, durationMs))
    }
  }

  /** Feature extraction: mapPartitions so a real codec is initialized once
    * per partition (the batch shape that matters), never per row. Image
    * rows decode real pixels (luminance histogram); audio rows decode real
    * PCM (RMS/ZCR/band energies); video uses the stub; an undecodable
    * payload falls back to the stub, never fails. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // a heavier codec would be opened HERE — once per partition
      it.map { m =>
        val f = m.kind match {
          case "image" =>
            ImageIoCodec.tryDecode(m.bytes)
              .map(ImageIoCodec.features(_, dim))
              .getOrElse(StubCodec.features(m.bytes, dim))
          case "audio" =>
            WavCodec.tryDecode(m.bytes)
              .map(WavCodec.features(_, dim))
              .getOrElse(StubCodec.features(m.bytes, dim))
          case _ =>
            AviMjpegCodec.tryDecodeFrames(m.bytes)
              .map(AviMjpegCodec.features(_, dim))
              .getOrElse(StubCodec.features(m.bytes, dim))
        }
        MediaFeatures(m.media_id, m.kind, f)
      }
    }
  }

  /** Resize images (other kinds pass through), meta updated consistently.
    * Decodable images are genuinely resampled and re-encoded as PNG. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") {
          val out = ImageIoCodec.tryDecode(m.bytes)
            .map(ImageIoCodec.resizePng(_, w, h))
            .getOrElse(StubCodec.resize(m.bytes, w, h))
          m.copy(bytes = out, meta = m.meta.copy(width = w, height = h))
        } else m
      }
    }
  }

  /** Frame sampling for video rows: one media row → n frame rows (the
    * multimodal analogue of the listing UDTF). Decodable MJPEG-AVI rows
    * yield REAL evenly-spaced frames re-encoded as standalone JPEGs;
    * foreign payloads fall back to the stub's byte slicing. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      AviMjpegCodec.tryDecodeFrames(m.bytes) match {
        case Some(frames) =>
          (0 until n).map { i =>
            val idx = (i.toLong * frames.length / n).toInt.min(frames.length - 1)
            MediaFrame(m.media_id, i, AviMjpegCodec.toJpeg(frames(idx)))
          }
        case None =>
          StubCodec.sampleFrames(m.bytes, n).zipWithIndex.map {
            case (b, i) => MediaFrame(m.media_id, i, b)
          }
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
