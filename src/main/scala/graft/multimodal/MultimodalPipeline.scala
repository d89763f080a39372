package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-batched passes.
  *
  * The PySpark idiom for this is a Pandas UDF over `mapInPandas`; the Scala
  * equivalent with the same execution shape (per-partition batched
  * processing, schema declared up front, no driver collection) is
  * `Dataset.mapPartitions` with case-class Encoders — that is what runs
  * here.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode step is a clearly-marked deterministic STUB (`FakeCodec`): it
  * produces stable pseudo-frames from the bytes so the surrounding Spark
  * machinery — schema, partitioning, batch shape, feature extraction — is
  * real and testable. Swap `FakeCodec` for a JNI/FFmpeg binding in a real
  * deployment; nothing else changes.
  */
object MultimodalPipeline {

  final case class MediaMeta(
      kind: String, // "image" | "audio" | "video"
      width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long, format: String)

  final case class MediaItem(media_id: Long, meta: MediaMeta, content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String,
      n_bytes: Long, mean_byte: Double, byte_entropy: Double,
      histogram: Array[Long], // 16-bucket byte histogram
      n_frames: Int)

  /** STUB decoder — deterministic pseudo-frames in place of a real codec.
    * A real implementation would decode `content` with an image/audio
    * library; the frame *shape* (count derived from metadata, fixed-size
    * byte planes) mirrors what a decoder returns. */
  object FakeCodec {
    def frameCount(meta: MediaMeta): Int = meta.kind match {
      case "image" => 1
      case "audio" => math.max(1, (meta.durationMs / 1000).toInt)
      case _ => math.max(1, (meta.durationMs / 40).toInt) // ~25 fps
    }

    /** Deterministic "decoded frame": a slice view of the payload. */
    def frame(content: Array[Byte], i: Int, nFrames: Int): Array[Byte] = {
      val span = math.max(1, content.length / nFrames)
      content.slice(i * span, math.min(content.length, (i + 1) * span))
    }
  }

  /** Deterministic synthetic media table (md5-derived byte payloads +
    * metadata). Generated distributed — each partition synthesizes its own
    * rows. Payload bytes are the concatenation of md5("<id>:<block>")
    * digests truncated to the payload length — a pure function of the id
    * that any engine with an md5 builtin can reproduce (the DuckDB oracle
    * reconstructs the identical bytes from hex substrings), unlike the
    * previous scala.util.Random stream which was JVM-only. */
  def synthesize(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 512).toInt
      val content = new Array[Byte](len)
      val md = java.security.MessageDigest.getInstance("MD5")
      var off = 0
      var block = 0
      while (off < len) {
        val d = md.digest(s"$id:$block".getBytes("UTF-8"))
        val c = math.min(16, len - off)
        System.arraycopy(d, 0, content, off, c)
        off += c
        block += 1
      }
      val meta = kind match {
        case "image" => MediaMeta(kind, 64, 48, 0, 0L, "fake-png")
        case "audio" => MediaMeta(kind, 0, 0, 16000, 2000 + (id % 5) * 1000, "fake-wav")
        case _ => MediaMeta(kind, 64, 48, 0, 400 + (id % 5) * 200, "fake-mp4")
      }
      MediaItem(id, meta, content)
    }
  }

  /** Partition-batched feature extraction (the mapInPandas analog):
    * decode-stub each item, compute byte statistics + a 16-bucket
    * histogram. Runs one pass per partition, no shuffle. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { item =>
        val bytes = item.content
        val hist = new Array[Long](16)
        var sum = 0L
        bytes.foreach { b =>
          val u = b & 0xff
          hist(u >> 4) += 1
          sum += u
        }
        val n = bytes.length.toLong
        val entropy = hist.filter(_ > 0).map { c =>
          val p = c.toDouble / n
          -p * math.log(p) / math.log(2)
        }.sum
        MediaFeatures(item.media_id, item.meta.kind, n,
          if (n == 0) 0.0 else sum.toDouble / n,
          entropy, hist, FakeCodec.frameCount(item.meta))
      }
    }
  }

  /** Frame sampling (every Nth pseudo-frame) — the video keyframe-extract
    * shape: one input row explodes to n_frames/stride rows. */
  def sampleFrames(media: Dataset[MediaItem], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { item =>
      val nf = FakeCodec.frameCount(item.meta)
      (0 until nf by stride).map { i =>
        (item.media_id, i, FakeCodec.frame(item.content, i, nf))
      }
    }.toDF("media_id", "frame_index", "frame_bytes")
  }

  /** Resize stub: deterministic byte-plane downsample (every-kth byte) —
    * placeholder for a real resampler; preserves the binary-column shape. */
  def resize(media: Dataset[MediaItem], factor: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    media.map { item =>
      val ds = item.content.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
      item.copy(content = ds,
        meta = item.meta.copy(width = item.meta.width / factor,
          height = item.meta.height / factor))
    }
  }
}
