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

  test("media features compose into the similarity-search operator") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val s = SparkSpec.session
    // byte-histogram features as a (low-dim) embedding column → the same
    // ANN machinery used for text embeddings works on media features
    val feats = MultimodalPipeline.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"),
        transform(col("histogram"), x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
    val queries = feats.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val corpus = feats.select(col("vec_id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val topk = graft.operators.SimilaritySearch.bruteForceTopK(queries, corpus, 5)
    assert(topk.count() == 15)
    assert(topk.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("real decode round-trips md5 payloads, dimensions, and frame counts") {
    import MultimodalPipeline._
    media.collect().foreach { m =>
      val id = m.media_id
      val want = md5Stream(id, dataLen(id))
      m.meta.kind match {
        case "image" =>
          val (img, px) = JdkCodec.decodeBmp(m.content)
          assert(img.getWidth == 16 && img.getHeight == 4 + (id % 8).toInt)
          assert(px.sameElements(want))
        case "audio" =>
          val (nFrames, data) = JdkCodec.decodeWav(m.content)
          assert(nFrames == 2000 + (id % 5) * 1000)
          assert(data.sameElements(want))
        case _ =>
          val frames = JdkCodec.decodeVideo(m.content)
          assert(frames.length == (2 + (id % 5)).toInt)
          val px = frames.flatMap(f => JdkCodec.decodeBmp(f)._2).toArray
          assert(px.sameElements(want))
      }
    }
    // features are computed over the decoded bytes, so n_bytes == dataLen
    MultimodalPipeline.extractFeatures(media).collect().foreach { f =>
      assert(f.n_bytes == dataLen(f.media_id))
    }
  }

  test("image aHash survives the BMP encode→decode round trip") {
    import MultimodalPipeline._
    // hash of the decoded container == hash of the raw payload bytes: the
    // codec must not alter a single pixel the hash reads
    val items = synthesizeImageDups(spark, 24).collect()
    items.foreach { item =>
      val (img, px) = JdkCodec.decodeBmp(item.content)
      val viaCodec = imageAHash64(px, img.getWidth, img.getHeight)
      val srcId = if (item.media_id % 4 == 3) item.media_id - 1 else item.media_id
      val raw = md5Stream(srcId, PHashW * PHashH * 3)
      if (item.media_id % 4 == 3) {
        val o = 3 * (2 * ((item.media_id * 7) % 8) + PHashW * ((item.media_id * 11) % 8)).toInt
        raw(o) = (255 - (raw(o) & 0xff)).toByte
      }
      assert(viaCodec == imageAHash64(raw, PHashW, PHashH), s"id ${item.media_id}")
    }
  }

  test("planted near-dups hash within the banded verify threshold") {
    import MultimodalPipeline._
    val hashes = imageHashes(synthesizeImageDups(spark, 200))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted pair (4k+2 → 4k+3) is within hamming 3 — the banding
    // (4×16-bit, lossless for ≤3 by pigeonhole) must surface all of them
    val planted = (0 until 200).filter(_ % 4 == 3).map(i => (i - 1, i))
    planted.foreach { case (a, b) =>
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(d <= 3, s"planted pair ($a,$b) hamming $d")
    }
    // and no un-planted pair sneaks under the threshold in this fixture
    // (deterministic corpus — random 64-bit hashes sit ~32 bits apart)
    val all = for {
      a <- 0 until 200; b <- a + 1 until 200
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)
    assert(all == planted, s"unexpected pairs: ${all.diff(planted)}")
  }

  test("resize really rescales: decoded dims, sample counts, durations halve") {
    import MultimodalPipeline._
    val resized = MultimodalPipeline.resize(media, 2)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.collect().foreach { m =>
      val o = orig(m.media_id)
      m.meta.kind match {
        case "image" =>
          val (img, _) = JdkCodec.decodeBmp(m.content)
          assert(img.getWidth == o.meta.width / 2 && img.getHeight == o.meta.height / 2)
          assert(m.meta.width == o.meta.width / 2)
        case "audio" =>
          val (nf, _) = JdkCodec.decodeWav(m.content)
          val (onf, _) = JdkCodec.decodeWav(o.content)
          assert(nf == (onf + 1) / 2)
          assert(m.meta.durationMs == o.meta.durationMs / 2)
        case _ =>
          val frames = JdkCodec.decodeVideo(m.content)
          assert(frames.length == JdkCodec.decodeVideo(o.content).length)
          val (img, _) = JdkCodec.decodeBmp(frames.head)
          assert(img.getWidth == o.meta.width / 2 && img.getHeight == o.meta.height / 2)
      }
    }
  }
}
