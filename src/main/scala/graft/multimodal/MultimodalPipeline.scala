package graft.multimodal

import java.awt.geom.AffineTransform
import java.awt.image.{AffineTransformOp, BufferedImage}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

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
  * Decode is REAL and JDK-only ([[JdkCodec]]): images are valid 24-bit BMP
  * files decoded with `javax.imageio`, audio is valid 16-bit PCM WAV
  * decoded with `javax.sound.sampled`, and video — the one modality with
  * no JDK codec — is a length-prefixed motion-BMP container whose frames
  * are each real BMPs (a production deployment swaps the container parser
  * for an FFmpeg binding; the per-frame decode path is unchanged). The
  * pixel/sample payloads are md5-derived pure functions of the media id,
  * so the DuckDB oracle recomputes every decoded-byte feature from first
  * principles without a codec (x03/x09).
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
      histogram: Array[Long], // 16-bucket byte histogram (over decoded bytes)
      n_frames: Int)

  /** Deterministic payload bytes: concatenated md5("<id>:<block>") digests
    * truncated to `len` — a pure function of the id that any engine with
    * an md5 builtin reproduces (the DuckDB oracle reconstructs identical
    * bytes from hex substrings). */
  def md5Stream(id: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val md = java.security.MessageDigest.getInstance("MD5")
    var off = 0
    var block = 0
    while (off < len) {
      val d = md.digest(s"$id:$block".getBytes("UTF-8"))
      val c = math.min(16, len - off)
      System.arraycopy(d, 0, out, off, c)
      off += c
      block += 1
    }
    out
  }

  /** Real JDK-only media codecs. Encoding writes genuine containers;
    * decoding parses them back with the platform libraries. Pixel byte
    * order is normalized to (B,G,R) row-major top-down on both sides, so
    * encode→decode round-trips the payload stream exactly regardless of
    * the decoder's internal raster layout. */
  object JdkCodec {
    val AudioSampleRate = 8000f

    /** data = (B,G,R) per pixel, row-major; length must be w*h*3. */
    def encodeBmp(w: Int, h: Int, data: Array[Byte]): Array[Byte] = {
      require(data.length == w * h * 3, s"pixel bytes ${data.length} != ${w * h * 3}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = data(i) & 0xff; val g = data(i + 1) & 0xff; val r = data(i + 2) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          i += 3; x += 1
        }
        y += 1
      }
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", baos)
      baos.toByteArray
    }

    /** Inverse of [[encodeBmp]]: (image, pixel bytes in (B,G,R) order). */
    def decodeBmp(bytes: Array[Byte]): (BufferedImage, Array[Byte]) = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val out = new Array[Byte](img.getWidth * img.getHeight * 3)
      var i = 0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          out(i) = (rgb & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = ((rgb >> 16) & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      (img, out)
    }

    /** data = 16-bit signed little-endian mono PCM samples. */
    def encodeWav(data: Array[Byte]): Array[Byte] = {
      val fmt = new AudioFormat(AudioSampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, data.length / 2)
      val baos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }

    /** Inverse of [[encodeWav]]: (PCM frame count, sample bytes). */
    def decodeWav(bytes: Array[Byte]): (Long, Array[Byte]) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val data = ais.readAllBytes()
      (ais.getFrameLength, data)
    }

    /** Motion-BMP container: int32-BE frame count, then per frame an
      * int32-BE byte length + the BMP file. */
    def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(baos)
      out.writeInt(frames.length)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      baos.toByteArray
    }

    /** Inverse of [[encodeVideo]]: the contained BMP files. */
    def decodeVideo(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val len = in.readInt()
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      }
    }
  }

  private val ImgW = 16
  private val VideoFrameH = 4
  private val AudioChunkBytes = 4000 // 2000 samples per sampling chunk

  /** Decoded data length per media id — the pure-arithmetic contract the
    * DuckDB oracle mirrors (x03/x09). */
  def dataLen(id: Long): Int = (id % 3) match {
    case 0 => ImgW * 3 * (4 + (id % 8)).toInt               // w*h*3
    case 1 => 2 * (2000 + (id % 5) * 1000).toInt            // 2 bytes/sample
    case _ => ImgW * VideoFrameH * 3 * (2 + (id % 5)).toInt // nf frames
  }

  /** Deterministic synthetic media table: VALID containers (BMP/WAV/
    * motion-BMP) whose payload bytes are md5-derived. Generated
    * distributed — each partition synthesizes and encodes its own rows. */
  def synthesize(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val data = md5Stream(id, dataLen(id))
      (id % 3) match {
        case 0 =>
          val h = 4 + (id % 8).toInt
          MediaItem(id, MediaMeta("image", ImgW, h, 0, 0L, "bmp"),
            JdkCodec.encodeBmp(ImgW, h, data))
        case 1 =>
          val nSamples = data.length / 2
          MediaItem(id,
            MediaMeta("audio", 0, 0, JdkCodec.AudioSampleRate.toInt,
              nSamples * 1000L / JdkCodec.AudioSampleRate.toLong, "wav"),
            JdkCodec.encodeWav(data))
        case _ =>
          val nf = (2 + (id % 5)).toInt
          val frameBytes = ImgW * VideoFrameH * 3
          val frames = (0 until nf).map(f => JdkCodec.encodeBmp(
            ImgW, VideoFrameH, data.slice(f * frameBytes, (f + 1) * frameBytes)))
          MediaItem(id,
            MediaMeta("video", ImgW, VideoFrameH, 0, nf * 40L, "mbmp"),
            JdkCodec.encodeVideo(frames))
      }
    }
  }

  /** Decode one item to (decoded frame list, decoded-frame count).
    * "Frames" here is the sampling granularity: the image itself, per-BMP
    * video frames, 2000-sample audio chunks. The returned count is the
    * modality's native frame count (PCM frames for audio). */
  private def decode(item: MediaItem): (Seq[Array[Byte]], Int) = item.meta.kind match {
    case "image" =>
      val (img, px) = JdkCodec.decodeBmp(item.content)
      require(img.getWidth == item.meta.width && img.getHeight == item.meta.height,
        s"decoded ${img.getWidth}x${img.getHeight} != metadata")
      (Seq(px), 1)
    case "audio" =>
      val (nFrames, data) = JdkCodec.decodeWav(item.content)
      (data.grouped(AudioChunkBytes).toSeq, nFrames.toInt)
    case _ =>
      val px = JdkCodec.decodeVideo(item.content).map(f => JdkCodec.decodeBmp(f)._2)
      (px, px.length)
  }

  /** Partition-batched feature extraction (the mapInPandas analog):
    * REAL-decode each item with the JDK codecs, compute byte statistics +
    * a 16-bucket histogram over the decoded payload. One pass per
    * partition, no shuffle. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { item =>
        val (frames, nFrames) = decode(item)
        val hist = new Array[Long](16)
        var sum = 0L
        var n = 0L
        frames.foreach(_.foreach { b =>
          val u = b & 0xff
          hist(u >> 4) += 1
          sum += u
          n += 1
        })
        val entropy = hist.filter(_ > 0).map { c =>
          val p = c.toDouble / n
          -p * math.log(p) / math.log(2)
        }.sum
        MediaFeatures(item.media_id, item.meta.kind, n,
          if (n == 0) 0.0 else sum.toDouble / n,
          entropy, hist, nFrames)
      }
    }
  }

  /** Frame sampling (every Nth decoded frame) — the video keyframe-extract
    * shape: one input row explodes to its sampled decoded frames (pixel
    * bytes for image/video, 2000-sample PCM chunks for audio). */
  /** Dimensions of the perceptual-hash fixture: fixed 16×8 so every image
    * shares one 64-bit hash grid. */
  val PHashW = 16
  val PHashH = 8

  /** Deterministic image corpus WITH PLANTED NEAR-DUPS for the perceptual
    * dedup operator (x31): every id is a 16×8 BMP of md5-derived pixels;
    * ids with id % 4 == 3 carry the PREVIOUS id's payload with one sampled
    * pixel's blue channel complemented (255 − b) — a visually-identical
    * variant whose aHash sits within a couple of bits of its source. The
    * perturbation arithmetic is pure integer math on (id), so the DuckDB
    * oracle rebuilds the exact bytes without a codec. */
  def synthesizeImageDups(spark: SparkSession, n: Int,
                          partitions: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    val len = PHashW * PHashH * 3
    spark.range(0, n, 1, partitions).map { boxedId =>
      val id: Long = boxedId
      val srcId = if (id % 4 == 3) id - 1 else id
      val data = md5Stream(srcId, len)
      if (id % 4 == 3) {
        // blue channel of sampled pixel (x = 2·((id·7) mod 8), y = (id·11) mod 8)
        val o = 3 * (2 * ((id * 7) % 8) + PHashW * ((id * 11) % 8)).toInt
        data(o) = (255 - (data(o) & 0xff)).toByte
      }
      MediaItem(id, MediaMeta("image", PHashW, PHashH, 0, 0L, "bmp"),
        JdkCodec.encodeBmp(PHashW, PHashH, data))
    }
  }

  /** 64-bit average hash over a decoded 16×8 pixel grid: sample every
    * second column (8×8 grid), gray = (b+g+r) div 3, bit k set iff
    * 64·gray_k > Σgray (strict — integer-exact, no float mean). The
    * standard aHash shape with the resampling grid-aligned so an oracle
    * can recompute it bit for bit. */
  def imageAHash64(px: Array[Byte], w: Int, h: Int): Long = {
    require(w == PHashW && h == PHashH, s"aHash expects ${PHashW}x$PHashH, got ${w}x$h")
    val grays = new Array[Int](64)
    var sum = 0L
    var k = 0
    while (k < 64) {
      val y = k / 8
      val x = 2 * (k % 8)
      val i = (y * w + x) * 3
      val g = ((px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)) / 3
      grays(k) = g
      sum += g
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (64L * grays(k) > sum) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** REAL-decode each image and emit its 64-bit perceptual hash — the
    * per-row map stage of the multimodal dedup (no shuffle). */
  def imageHashes(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { item =>
        val (img, px) = JdkCodec.decodeBmp(item.content)
        (item.media_id, imageAHash64(px, img.getWidth, img.getHeight))
      }
    }.toDF("media_id", "phash")
  }

  def sampleFrames(media: Dataset[MediaItem], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { item =>
      val (frames, _) = decode(item)
      frames.zipWithIndex.collect {
        case (f, i) if i % stride == 0 => (item.media_id, i, f)
      }
    }.toDF("media_id", "frame_index", "frame_bytes")
  }

  /** Real media resize/downsample: images scale by 1/factor with
    * nearest-neighbor resampling and re-encode as BMP; audio decimates to
    * every factor-th sample (duration shrinks, rate kept); video applies
    * the image path per frame. */
  def resize(media: Dataset[MediaItem], factor: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._

    def scaleBmp(bmp: Array[Byte]): Array[Byte] = {
      val (img, _) = JdkCodec.decodeBmp(bmp)
      val (w, h) = (math.max(1, img.getWidth / factor), math.max(1, img.getHeight / factor))
      val op = new AffineTransformOp(
        AffineTransform.getScaleInstance(w.toDouble / img.getWidth, h.toDouble / img.getHeight),
        AffineTransformOp.TYPE_NEAREST_NEIGHBOR)
      val dst = op.filter(img, new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR))
      val baos = new ByteArrayOutputStream()
      ImageIO.write(dst, "bmp", baos)
      baos.toByteArray
    }

    media.map { item =>
      item.meta.kind match {
        case "image" =>
          item.copy(content = scaleBmp(item.content),
            meta = item.meta.copy(width = math.max(1, item.meta.width / factor),
              height = math.max(1, item.meta.height / factor)))
        case "audio" =>
          val (_, data) = JdkCodec.decodeWav(item.content)
          val kept = data.grouped(2).zipWithIndex
            .collect { case (s, i) if i % factor == 0 => s }
            .flatten.toArray
          item.copy(content = JdkCodec.encodeWav(kept),
            meta = item.meta.copy(durationMs = item.meta.durationMs / factor))
        case _ =>
          item.copy(content = JdkCodec.encodeVideo(
            JdkCodec.decodeVideo(item.content).map(scaleBmp)),
            meta = item.meta.copy(width = math.max(1, item.meta.width / factor),
              height = math.max(1, item.meta.height / factor)))
      }
    }
  }
}
