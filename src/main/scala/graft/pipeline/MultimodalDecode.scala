package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** Decode / feature-extract stage for multimodal binary columns — the
  * Scala analogue of a Pandas-UDF-over-`mapInPandas` stage: binary
  * column in, typed feature struct out, processed partition-at-a-time
  * so per-task decoder initialization (codec tables, a model handle)
  * amortizes over the whole partition.
  *
  * Two decoders behind one trait: [[ImageIoDecoder]] is a REAL decode
  * path for the formats the JDK's `javax.imageio` ships readers for
  * (PNG/JPEG/GIF/BMP — no extra deps); [[StubDecoder]] remains the
  * deterministic stand-in for codecs this container lacks (audio,
  * video, webp). Swapping decoders (e.g. TwelveMonkeys/JavaCV behind
  * the same trait) changes no Spark plumbing: schema, partitioning,
  * batch shape and the accounting contract stay identical.
  *
  * Scale: one decoder instance per task, rows streamed (no partition
  * materialization), output is a narrow fixed-width struct — the blob
  * bytes are dropped as early as possible so downstream stages never
  * shuffle media payloads.
  */
object MultimodalDecode {

  /** The decoded feature row (what a real image decode would yield). */
  final case class Decoded(
      doc_id: Long,
      size_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      // stubbed content features: a 8-bin byte histogram, L1-normalized
      histogram: Array[Float],
      decode_ok: Boolean)

  /** Decoder contract: one instance per task (init amortized). */
  trait Decoder extends Serializable {
    /** Called once per task before the first record. */
    def init(): Unit
    def decode(docId: Long, bytes: Array[Byte]): Decoded
  }

  /** STUB decode — deterministic fake standing in for a real media
    * decoder (none available in this container). Header fields mirror
    * the synthetic header convention of
    * [[graft.queries.Multimodal.q33BlobMeta]]; the "histogram" is a
    * real byte histogram of the payload, which a real decoder would
    * replace with pixel statistics. */
  final class StubDecoder extends Decoder {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true }
    override def decode(docId: Long, bytes: Array[Byte]): Decoded = {
      require(initialized, "decoder used before init()")
      if (bytes == null || bytes.length < 3)
        Decoded(docId, if (bytes == null) 0 else bytes.length, 0, 0, 0,
          Array.fill(8)(0f), decode_ok = false)
      else {
        val counts = new Array[Int](8)
        bytes.foreach(b => counts((b & 0xff) >> 5) += 1)
        val n = bytes.length.toFloat
        Decoded(docId, bytes.length,
          (bytes(0) & 0xff) + 1, (bytes(1) & 0xff) + 1,
          (bytes(2) & 0xff) % 4 + 1,
          counts.map(_ / n), decode_ok = true)
      }
    }
  }

  /** REAL decode path for PNG (and any other `javax.imageio`-readable
    * format — the JDK ships PNG/JPEG/GIF/BMP readers, zero new deps):
    * width/height from the decoded raster, channels from the color
    * model, and the 8-bin histogram computed over pixel LUMINANCE
    * (integer Rec.601 weights) instead of raw payload bytes.
    * Non-image bytes fail soft with `decode_ok = false` — the same
    * contract as the stub, so the two decoders are drop-in
    * interchangeable behind [[Decoder]]. */
  final class ImageIoDecoder extends Decoder {
    @transient private var initialized = false
    override def init(): Unit = {
      // headless decode: no display needed in executors
      System.setProperty("java.awt.headless", "true")
      initialized = true
    }
    private def failed(docId: Long, size: Int): Decoded =
      Decoded(docId, size, 0, 0, 0, Array.fill(8)(0f), decode_ok = false)
    override def decode(docId: Long, bytes: Array[Byte]): Decoded = {
      require(initialized, "decoder used before init()")
      if (bytes == null) failed(docId, 0)
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) failed(docId, bytes.length)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val counts = new Array[Int](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              counts(lum >> 5) += 1
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          Decoded(docId, bytes.length, w, h,
            img.getColorModel.getNumComponents, counts.map(_ / n),
            decode_ok = true)
        }
      } catch { case _: Exception => failed(docId, bytes.length) }
    }
  }

  /** Run the decode stage over a DataFrame with (doc_id: long,
    * blob: binary) columns. */
  def decodeFeatures(blobs: DataFrame,
      decoder: Decoder = new StubDecoder): Dataset[Decoded] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init() // once per task, before the first record
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  // --------------------------------------------------------- resize

  /** One resized image: the shape-normalizing 1:1 stage a vision
    * model's preprocessing needs (every image to a fixed W×H before
    * batching/embedding). Carries the re-encoded payload because the
    * NEXT stage (batch encode) consumes bytes, not features. */
  final case class Resized(
      doc_id: Long,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      out_bytes: Array[Byte],
      resize_ok: Boolean)

  /** Resizer contract — same per-task-init, fail-soft shape as
    * [[Decoder]]/[[AudioDecoder]]. */
  trait Resizer extends Serializable {
    def init(): Unit
    def resize(docId: Long, bytes: Array[Byte], w: Int, h: Int): Resized
  }

  /** REAL resize path, JDK-only: decode via `javax.imageio`, scale
    * with a bilinear AWT `Graphics2D` draw (headless), re-encode PNG.
    * Non-image bytes fail soft with `resize_ok = false` and an empty
    * payload — never a task kill. */
  final class AwtResizer extends Resizer {
    @transient private var initialized = false
    override def init(): Unit = {
      System.setProperty("java.awt.headless", "true")
      initialized = true
    }
    private def failed(docId: Long, w: Int, h: Int): Resized =
      Resized(docId, 0, 0, w, h, Array.emptyByteArray, resize_ok = false)
    override def resize(docId: Long, bytes: Array[Byte],
        w: Int, h: Int): Resized = {
      require(initialized, "resizer used before init()")
      if (bytes == null) failed(docId, w, h)
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) failed(docId, w, h)
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Resized(docId, img.getWidth, img.getHeight, w, h,
            baos.toByteArray, resize_ok = true)
        }
      } catch { case _: Exception => failed(docId, w, h) }
    }
  }

  /** Run the resize stage over (doc_id: long, blob: binary): 1:1, the
    * source blob dropped at the stage boundary (downstream ships the
    * fixed-size payload only). */
  def resizeImages(blobs: DataFrame, w: Int, h: Int,
      resizer: Resizer = new AwtResizer): Dataset[Resized] = {
    require(w >= 1 && h >= 1, "target dims must be >= 1")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        resizer.init()
        rows.map { case (id, bytes) => resizer.resize(id, bytes, w, h) }
      }
  }

  // --------------------------------------------------------- audio

  /** The decoded audio feature row (what a real audio decode yields). */
  final case class DecodedAudio(
      doc_id: Long,
      size_bytes: Int,
      sample_rate_hz: Int,
      channels: Int,
      frames: Long,
      duration_ms: Long,
      // root-mean-square amplitude over normalized [-1, 1] samples
      rms: Float,
      decode_ok: Boolean)

  trait AudioDecoder extends Serializable {
    def init(): Unit
    def decode(docId: Long, bytes: Array[Byte]): DecodedAudio
  }

  /** REAL audio decode for the formats the JDK's `javax.sound.sampled`
    * ships readers for (WAV/AIFF/AU PCM — zero new deps): sample rate,
    * channel count and frame length from the audio format, RMS
    * amplitude computed over the decoded 16-bit PCM samples. Codecs
    * the JDK lacks (mp3, ogg, flac) fail soft with
    * `decode_ok = false` — swap in a richer provider (e.g. a JavaCV
    * decoder) behind the same trait without touching the Spark
    * plumbing, exactly like [[ImageIoDecoder]] vs [[StubDecoder]]. */
  final class WavDecoder extends AudioDecoder {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true }
    private def failed(docId: Long, size: Int): DecodedAudio =
      DecodedAudio(docId, size, 0, 0, 0L, 0L, 0f, decode_ok = false)
    override def decode(docId: Long, bytes: Array[Byte]): DecodedAudio = {
      require(initialized, "decoder used before init()")
      if (bytes == null) failed(docId, 0)
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val rate = fmt.getSampleRate.toInt
          val durationMs =
            if (rate > 0) frames * 1000L / rate else 0L
          // RMS over 16-bit little/big-endian PCM; other sample sizes
          // report format metadata only (rms = 0)
          val rms =
            if (fmt.getSampleSizeInBits == 16) {
              val data = in.readAllBytes()
              val n = data.length / 2
              var sumSq = 0.0
              var i = 0
              while (i < n) {
                val lo = data(2 * i) & 0xff
                val hi = data(2 * i + 1)
                val sample: Int =
                  if (fmt.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
                  else (hi << 8) | lo
                val norm = sample / 32768.0
                sumSq += norm * norm
                i += 1
              }
              if (n > 0) math.sqrt(sumSq / n).toFloat else 0f
            } else 0f
          DecodedAudio(docId, bytes.length, rate, fmt.getChannels, frames,
            durationMs, rms, decode_ok = true)
        } finally in.close()
      } catch { case _: Exception => failed(docId, bytes.length) }
    }
  }

  /** Run the audio decode stage over (doc_id: long, blob: binary). */
  def decodeAudioFeatures(blobs: DataFrame,
      decoder: AudioDecoder = new WavDecoder): Dataset[DecodedAudio] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        decoder.init()
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  // --------------------------------------------------------- video

  /** One sampled video frame: the ONE-TO-MANY decode shape (a video
    * row fans out to N frame rows) — different plumbing than the 1:1
    * image/audio stages, which is the point of having it. */
  final case class SampledFrame(
      doc_id: Long,
      frame_idx: Long,
      ts_ms: Long,
      // per-frame content fingerprint (what a keyframe-dedup or an
      // embedding stage would consume next)
      frame_fp: Long)

  /** Frame-sampler contract: iterate a container's frames LAZILY and
    * emit every `stride`-th one — a real codec must never materialize
    * the whole video. */
  trait FrameSampler extends Serializable {
    def init(): Unit
    def sample(docId: Long, bytes: Array[Byte],
        stride: Int): Iterator[SampledFrame]
  }

  /** STUB video codec — no video codec ships in this container, so the
    * container format is a deterministic fake: byte 0 = frame count,
    * byte 1 = frame-interval ms, frame i's fingerprint = FNV-1a over
    * (payload, i). Everything AROUND the codec is the real design:
    * lazy frame iteration (no per-video materialization), stride
    * sampling, per-task init, and the one-to-many flatMap plumbing —
    * swap in a JavaCV/FFmpeg sampler behind the same trait and
    * nothing else changes. */
  final class StubFrameSampler extends FrameSampler {
    @transient private var initialized = false
    override def init(): Unit = { initialized = true }
    override def sample(docId: Long, bytes: Array[Byte],
        stride: Int): Iterator[SampledFrame] = {
      require(initialized, "sampler used before init()")
      if (bytes == null || bytes.length < 2) Iterator.empty
      else {
        val nFrames = bytes(0) & 0xff
        val intervalMs = (bytes(1) & 0xff).toLong
        Iterator.range(0, nFrames).filter(_ % stride == 0).map { i =>
          var h = 0xcbf29ce484222325L
          bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
          h ^= i.toLong; h *= 0x100000001b3L
          SampledFrame(docId, i.toLong, i * intervalMs, h)
        }
      }
    }
  }

  /** Run the frame-sampling stage over (doc_id: long, blob: binary):
    * one input row fans out to ceil(frames/stride) frame rows. The
    * blob is dropped at the stage boundary — downstream sees only
    * narrow fixed-width frame rows, never media bytes. */
  def sampleFrames(blobs: DataFrame, stride: Int,
      sampler: FrameSampler = new StubFrameSampler): Dataset[SampledFrame] = {
    require(stride >= 1, "stride must be >= 1")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        sampler.init()
        rows.flatMap { case (id, bytes) => sampler.sample(id, bytes, stride) }
      }
  }
}
