package graft.multimodal

import graft.SparkSpec

class MultimodalPipelineSpec extends SparkSpec {

  private lazy val media = MultimodalPipeline.synthesize(SparkSpec.session, 60, partitions = 4)

  test("synthetic media table: binary payloads + typed metadata, distributed") {
    val df = media.toDF()
    assert(df.count() == 60)
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(media.rdd.getNumPartitions == 4)
    val kinds = media.collect().map(_.meta.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction: partition-batched, no shuffle, correct stats") {
    val feats = MultimodalPipeline.extractFeatures(media)
    // mapPartitions is narrow: partitioning preserved
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions)
    val rows = feats.collect()
    assert(rows.length == 60)
    rows.foreach { f =>
      assert(f.histogram.length == 16)
      assert(f.histogram.sum == f.n_bytes)
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 4.0 + 1e-9) // 16 buckets → ≤4 bits
      assert(f.n_frames >= 1)
    }
  }

  test("feature extraction is deterministic") {
    val a = MultimodalPipeline.extractFeatures(media).collect()
      .map(f => f.media_id -> f.byte_entropy).toMap
    val b = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.synthesize(SparkSpec.session, 60, partitions = 2)).collect()
      .map(f => f.media_id -> f.byte_entropy).toMap
    assert(a == b) // same seeds → same features regardless of partitioning
  }

  test("frame sampling explodes video/audio rows by frame count") {
    val frames = MultimodalPipeline.sampleFrames(media, stride = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_index", "frame_bytes"))
    val images = media.filter(_.meta.kind == "image").count()
    // images contribute exactly 1 frame each
    val imgFrames = frames.join(
      media.toDF().select("media_id", "meta.kind"), "media_id")
      .filter("kind = 'image'").count()
    assert(imgFrames == images)
    assert(frames.count() > 60 / 3) // video/audio explode to multiple frames
  }

  test("resize stub halves payloads and metadata dims") {
    val resized = MultimodalPipeline.resize(media, 2)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.collect().foreach { m =>
      val o = orig(m.media_id)
      assert(m.content.length == (o.content.length + 1) / 2)
      assert(m.meta.width == o.meta.width / 2)
    }
  }
}
