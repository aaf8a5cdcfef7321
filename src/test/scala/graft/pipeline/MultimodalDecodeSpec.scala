package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Spark-side plumbing spec for the multimodal decode stage: schema,
  * partition-wise decoder init, degenerate payloads, and agreement
  * between the decoded header fields and the columnar header extraction
  * of graft.queries.Multimodal. */
class MultimodalDecodeSpec extends SparkSuite {

  private lazy val blobs = {
    import spark.implicits._
    Seq(
      (1L, Array[Byte](0, 0, 0, 10, 20, 30)),
      (2L, Array[Byte](255.toByte, 127, 3, 1, 2, 3, 4, 5)),
      (3L, Array[Byte](1, 2)), // too short to decode
      (4L, null.asInstanceOf[Array[Byte]])) // missing payload
      .toDF("doc_id", "blob")
  }

  test("decode schema + header fields") {
    val out = MultimodalDecode.decodeFeatures(blobs)
    assert(out.columns.toSeq == Seq("doc_id", "size_bytes", "width",
      "height", "channels", "histogram", "decode_ok"))
    val byId = out.collect().map(d => d.doc_id -> d).toMap
    assert(byId(1L).width == 1 && byId(1L).height == 1 && byId(1L).channels == 1)
    assert(byId(2L).width == 256 && byId(2L).height == 128 && byId(2L).channels == 4)
    assert(byId(2L).size_bytes == 8)
  }

  test("degenerate payloads fail soft (decode_ok=false), never throw") {
    val byId = MultimodalDecode.decodeFeatures(blobs).collect()
      .map(d => d.doc_id -> d).toMap
    assert(!byId(3L).decode_ok && byId(3L).size_bytes == 2)
    assert(!byId(4L).decode_ok && byId(4L).size_bytes == 0)
    assert(byId(3L).histogram.toSeq == Seq.fill(8)(0f))
  }

  test("histogram is L1-normalized over payload bytes") {
    val d = MultimodalDecode.decodeFeatures(blobs).collect()
      .find(_.doc_id == 1L).get
    assert(math.abs(d.histogram.sum - 1f) < 1e-6)
    // bytes 0,0,0,10,20,30 all land in bin 0
    assert(d.histogram(0) == 1f)
  }

  test("decoder init runs once per task before records (mapPartitions shape)") {
    // a decoder that throws unless init() ran proves per-task init order
    val out = MultimodalDecode.decodeFeatures(
      blobs.repartition(3), new MultimodalDecode.StubDecoder)
    assert(out.count() == 4)
  }

  private def pngBytes(width: Int, height: Int,
      paint: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) img.setRGB(x, y, paint(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder decodes a real generated PNG's width/height/channels") {
    import spark.implicits._
    val png = pngBytes(5, 3, (_, _) => 0xffffff) // all-white 5x3
    val black = pngBytes(2, 2, (_, _) => 0x000000)
    val df = Seq((1L, png), (2L, black), (3L, "not a png".getBytes))
      .toDF("doc_id", "blob")
    val byId = MultimodalDecode.decodeFeatures(df,
      new MultimodalDecode.ImageIoDecoder).collect()
      .map(d => d.doc_id -> d).toMap
    assert(byId(1L).decode_ok && byId(1L).width == 5 && byId(1L).height == 3 &&
      byId(1L).channels == 3)
    assert(byId(1L).histogram(7) == 1f, "all-white pixels land in the top bin")
    assert(byId(2L).decode_ok && byId(2L).width == 2 && byId(2L).height == 2)
    assert(byId(2L).histogram(0) == 1f, "all-black pixels land in bin 0")
    // non-image bytes fail soft, identical contract to the stub
    assert(!byId(3L).decode_ok && byId(3L).width == 0 && byId(3L).size_bytes == 9)
  }

  test("ImageIoDecoder luminance histogram is L1-normalized over pixels") {
    import spark.implicits._
    // half white, half black 4x2 -> two bins at 0.5
    val png = pngBytes(4, 2, (x, _) => if (x < 2) 0xffffff else 0x000000)
    val d = MultimodalDecode.decodeFeatures(
      Seq((1L, png)).toDF("doc_id", "blob"),
      new MultimodalDecode.ImageIoDecoder).collect().head
    assert(math.abs(d.histogram.sum - 1f) < 1e-6)
    assert(d.histogram(0) == 0.5f && d.histogram(7) == 0.5f)
  }

  test("agrees with the columnar header extraction on the synthetic corpus") {
    import org.apache.spark.sql.DataFrame
    val dir = "/root/testdata/sf0.001"
    val meta: DataFrame = graft.queries.Multimodal.q33BlobMeta(spark, dir)
    // rebuild blobs the same way and run the decode stage
    val synth = graft.core.Tables.load(spark, dir, "documents")
      .withColumn("seed",
        when(col("doc_id") % 50 === 0, 0L).otherwise(col("doc_id")))
      .withColumn("blob", unhex(expr(
        """array_join(transform(sequence(0, CAST(2 + seed % 7 AS INT) - 1),
          |  i -> md5(concat('blob:', CAST(i AS STRING), ':', CAST(seed AS STRING)))), '')""".stripMargin)))
    val decoded = MultimodalDecode.decodeFeatures(synth)
    val joined = decoded.toDF().alias("d")
      .join(meta.alias("m"), "doc_id")
      .filter(col("d.width") =!= col("m.width") ||
        col("d.height") =!= col("m.height") ||
        col("d.size_bytes") =!= col("m.size_bytes"))
    assert(joined.count() == 0)
  }

  /** 16-bit PCM mono WAV of a full-scale-ish sine at `freqHz`. */
  private def sineWav(freqHz: Double, rateHz: Float, nFrames: Int,
      amplitude: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * freqHz * i / rateHz) * amplitude *
        32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rateHz, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WavDecoder decodes a real generated WAV: rate/channels/frames/duration/RMS") {
    import spark.implicits._
    val wav = sineWav(440.0, 8000f, 8000, amplitude = 0.8)
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val out = MultimodalDecode.decodeAudioFeatures(
      Seq((1L, wav), (2L, junk)).toDF("doc_id", "blob"))
      .collect().map(d => d.doc_id -> d).toMap
    val a = out(1L)
    assert(a.decode_ok)
    assert(a.sample_rate_hz == 8000 && a.channels == 1)
    assert(a.frames == 8000L && a.duration_ms == 1000L)
    // RMS of a sine at amplitude A is A/sqrt(2) ≈ 0.5657 for A = 0.8
    assert(math.abs(a.rms - 0.8 / math.sqrt(2)) < 0.01, a.rms)
    // non-audio bytes fail soft, same contract as the image path
    assert(!out(2L).decode_ok && out(2L).size_bytes == 5)
  }

  test("frame sampling fans one video row out to every stride-th frame") {
    import spark.implicits._
    // fake container: 10 frames at 40 ms interval; second video 3 frames
    val vids = Seq(
      (1L, Array[Byte](10, 40, 7, 7, 7)),
      (2L, Array[Byte](3, 100, 9)),
      (3L, Array[Byte](1)), // truncated header: no frames
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "blob")
    val frames = MultimodalDecode.sampleFrames(vids, stride = 3)
      .collect().groupBy(_.doc_id)
    // 10 frames, stride 3 -> indices 0, 3, 6, 9
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 3L, 6L, 9L))
    assert(frames(1L).map(f => f.frame_idx -> f.ts_ms).toMap ==
      Map(0L -> 0L, 3L -> 120L, 6L -> 240L, 9L -> 360L))
    assert(frames(2L).map(_.frame_idx).sorted.toSeq == Seq(0L))
    assert(!frames.contains(3L) && !frames.contains(4L))
    // fingerprints differ per frame and are deterministic per video
    assert(frames(1L).map(_.frame_fp).distinct.length == 4)
    val again = MultimodalDecode.sampleFrames(vids, stride = 3)
      .collect().groupBy(_.doc_id)
    assert(again(1L).map(f => f.frame_idx -> f.frame_fp).toMap ==
      frames(1L).map(f => f.frame_idx -> f.frame_fp).toMap)
  }

  test("AwtResizer resizes a real PNG to the target shape; output decodes back") {
    import spark.implicits._
    val big = pngBytes(16, 8, (x, _) => if (x < 8) 0xffffff else 0x000000)
    val df = Seq((1L, big), (2L, "not a png".getBytes))
      .toDF("doc_id", "blob")
    val byId = MultimodalDecode.resizeImages(df, 4, 4).collect()
      .map(r => r.doc_id -> r).toMap
    assert(byId(1L).resize_ok)
    assert(byId(1L).src_w == 16 && byId(1L).src_h == 8)
    assert(byId(1L).out_w == 4 && byId(1L).out_h == 4)
    // the payload is a REAL PNG of the resized raster
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(byId(1L).out_bytes))
    assert(round.getWidth == 4 && round.getHeight == 4)
    // left half stays bright, right half stays dark after bilinear scale
    val lum = (rgb: Int) => (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
      (rgb & 0xff)) / 3
    assert(lum(round.getRGB(0, 0)) > 180 && lum(round.getRGB(3, 0)) < 75)
    // non-image bytes fail soft with an empty payload
    assert(!byId(2L).resize_ok && byId(2L).out_bytes.isEmpty)
  }
}
