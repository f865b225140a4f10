package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("synthesize -> decode roundtrip: meta matches the encoded header") {
    import graft.multimodal.{AviCodec, BmpImage}
    val media = Multimodal.synthesize(spark, dir)
    val meta = Multimodal.decode(media).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(Seq("image", "audio", "video").contains(m.fmt))
      assert(m.modality === m.fmt) // synthesized modality survives decode
      assert(m.feature.length === 8)
      m.fmt match {
        case "audio" =>
          // REAL WAV decoded by the REAL library: mono, 8 kHz, container
          // arithmetic exact (44-byte canonical PCM header + 2 B/frame)
          assert(m.width === 1 && m.height === 8000)
          assert(m.n_frames >= 64)
          assert(m.n_bytes === 44L + 2L * m.n_frames)
        case "image" =>
          // REAL BMP: size formula exact, single frame
          assert(m.width >= 16 && m.width < 64)
          assert(m.height >= 16 && m.height < 64)
          assert(m.n_frames === 1)
          assert(m.n_bytes === BmpImage.size(m.width, m.height))
        case "video" =>
          // REAL uncompressed-DIB AVI: size formula exact
          assert(m.width >= 8 && m.width < 24)
          assert(m.height >= 8 && m.height < 24)
          assert(m.n_frames >= 1 && m.n_frames <= 30)
          assert(m.n_bytes ===
            AviCodec.aviSize(m.width, m.height, m.n_frames))
      }
    }
    // every payload really is its container format
    val rows = media.collect()
    assert(Multimodal.WavCodec.isRealWav(
      rows.find(_.modality == "audio").get.payload))
    assert(Multimodal.ImageIoCodec.isRealImage(
      rows.find(_.modality == "image").get.payload))
    assert(AviCodec.isRealAvi(
      rows.find(_.modality == "video").get.payload))
  }

  test("video rows: extracted frames decode as images, features equal " +
       "the text fingerprint") {
    import graft.multimodal.AviCodec
    val media = Multimodal.synthesize(spark, dir)
    val videos = media.collect().filter(_.modality == "video")
    assert(videos.nonEmpty)
    // decoded temporal features = the textAmps staircase (gray levels
    // quantized to bytes -> tolerance 1/255)
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    videos.take(10).foreach { v =>
      val d = AviCodec.read(v.payload)
      val amps = Multimodal.textAmps(texts(v.doc_id))
      val n = d.nFrames
      val segs = (0 until n).groupBy(f => math.min(7, f * 8 / n))
      (0 until 8).foreach { s =>
        val want = segs.get(s).map { fs =>
          val vals = fs.map(f =>
            (amps(math.min(7, f * 8 / n)) * 255).round.toDouble / 255.0)
          vals.sum / vals.size
        }.getOrElse(0.0)
        assert(math.abs(d.feature(s) - want) < 1e-6)
      }
    }
    // the extraction operator: every 7th frame as an ImageIO-decodable
    // BMP with the right dimensions
    val frames = Multimodal.extractFrameImages(media, 7).collect()
    assert(frames.nonEmpty)
    val metaByDoc = Multimodal.decode(media).collect()
      .map(m => m.doc_id -> m).toMap
    frames.take(20).foreach { r =>
      val (id, payload) =
        (r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("frame"))
      assert(Multimodal.ImageIoCodec.isRealImage(payload))
      val img = Multimodal.ImageIoCodec.read(payload)
      assert(img.getWidth === metaByDoc(id).width)
      assert(img.getHeight === metaByDoc(id).height)
    }
    // frame indices: every 7th, per video
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Long]("frame_idx")).sorted.toSeq ===
        (0L until metaByDoc(id).n_frames.toLong by 7L).toSeq)
    }
  }

  test("decode is deterministic across partitionings") {
    val media = Multimodal.synthesize(spark, dir)
    val a = Multimodal.decode(media).collect().sortBy(_.doc_id)
      .map(m => (m.doc_id, m.fmt, m.width, m.height, m.feature.toSeq))
    val b = Multimodal.decode(media.repartition(7)).collect().sortBy(_.doc_id)
      .map(m => (m.doc_id, m.fmt, m.width, m.height, m.feature.toSeq))
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling explodes only videos, every k-th frame") {
    val meta = Multimodal.decode(Multimodal.synthesize(spark, dir))
    val frames = Multimodal.sampleFrames(meta, 5).collect()
    val videos = meta.filter(org.apache.spark.sql.functions.col("fmt") === "video")
      .collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    videos.foreach { v =>
      val expected = (0 until v.n_frames by 5).toSeq
      assert(byDoc(v.doc_id).map(_.getAs[Int]("frame_idx")).toSeq.sorted === expected)
    }
    // non-videos contribute no frames
    assert(byDoc.keySet.subsetOf(videos.map(_.doc_id).toSet))
  }

  test("corrupt payload fails loudly, not silently") {
    intercept[Exception] {
      Multimodal.FakeCodec.decode("not-media".getBytes("UTF-8"))
    }
  }

  test("media near-dup: reported cosines verify by recomputation, band respected") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Multimodal.qMediaNearDup(spark, dir).collect()
    assert(pairs.nonEmpty)
    val feats = Multimodal.decode(Multimodal.synthesize(spark, dir))
      .collect().map(m => m.doc_id -> m.feature).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    pairs.foreach { r =>
      val expected = cos(feats(r.getAs[Long]("doc_a")), feats(r.getAs[Long]("doc_b")))
      assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-9)
      assert(r.getAs[Double]("cosine") >= 0.99999)
    }
  }

  test("real PNGs decode, feature-extract and resize through the production path") {
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    import spark.implicits._
    // synthesize real PNG payloads with ImageIO.write — deterministic
    // pixel patterns, distinct per doc
    def png(id: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7 + y * 13 + id * 31) % 256) * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", png(1, 320, 200)),
      Multimodal.MediaRow(2L, "image", png(2, 64, 64))))

    // decode: REAL dimensions come back from the REAL library
    val meta = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(meta.map(m => (m.fmt, m.width, m.height, m.n_frames)).toSeq ===
      Seq(("image", 320, 200, 1), ("image", 64, 64, 1)))
    // features: 8 grid-cell luminance means, in [0,1], deterministic
    meta.foreach { m =>
      assert(m.feature.length === 8)
      assert(m.feature.forall(f => f >= 0f && f <= 1f))
    }
    val again = Multimodal.decode(media.repartition(3)).collect()
      .sortBy(_.doc_id)
    assert(again.map(_.feature.toSeq).toSeq === meta.map(_.feature.toSeq).toSeq)

    // resize: payload is genuinely re-encoded (new PNG, new dims) and
    // re-decodes through the same production path
    val resized = Multimodal.decode(Multimodal.resize(media, 224, 224))
      .collect().sortBy(_.doc_id)
    assert(resized.map(m => (m.width, m.height)).toSeq ===
      Seq((224, 224), (224, 224)))
    val rePayload = Multimodal.resize(media, 224, 224).collect().head.payload
    assert(Multimodal.ImageIoCodec.isRealImage(rePayload))
    assert(!(rePayload sameElements media.collect().head.payload))
    // near-dup invariance: a resized image keeps nearly the same grid
    // features — the property the perceptual descriptor exists for
    meta.zip(resized).foreach { case (b, a) =>
      b.feature.zip(a.feature).foreach { case (x, y) =>
        assert(math.abs(x - y) < 0.08, s"feature drifted: $x vs $y")
      }
    }
  }

  test("real WAVs decode and feature-extract through the production path") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    // synthesize a real RIFF/WAVE payload with AudioSystem.write —
    // stereo 16-bit little-endian PCM at 8 kHz, 4000 frames of a sine
    // whose amplitude steps up once per eighth of the duration, so the
    // 8-segment RMS envelope is a known monotone staircase
    def wav(frames: Int, rate: Float, channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, rate, 16, channels,
        2 * channels, rate, false)
      val data = new Array[Byte](frames * 2 * channels)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (f <- 0 until frames) {
        val seg = math.min(7, f * 8 / frames)
        val a = seg / 8.0 * 0.8
        val s = (a * math.sin(2 * math.Pi * 440 * f / rate) * 32767).toShort
        for (_ <- 0 until channels) bb.putShort(s)
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val payload = wav(4000, 8000f, 2)
    assert(Multimodal.WavCodec.isRealWav(payload))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", payload)))

    // decode: REAL format metadata comes back from the REAL library —
    // width = channels, height = sample rate, n_frames = PCM frames
    val meta = Multimodal.decode(media).collect()
    assert(meta.length === 1)
    val m = meta.head
    assert(m.fmt === "audio")
    assert(m.width === 2 && m.height === 8000 && m.n_frames === 4000)
    assert(m.feature.length === 8)
    // segment s carries a sine of amplitude 0.8·s/8 → RMS ≈ 0.8·s/(8·√2);
    // segment 0 is silence
    assert(m.feature(0) === 0f)
    for (s <- 1 until 8) {
      val expected = 0.8 * s / 8.0 / math.sqrt(2.0)
      assert(math.abs(m.feature(s) - expected) < 0.01,
        s"segment $s: ${m.feature(s)} vs $expected")
    }
    // deterministic across partitionings
    val again = Multimodal.decode(media.repartition(3)).collect().head
    assert(again.feature.toSeq === m.feature.toSeq)
    // truncated payload (interrupted upload): the header still declares
    // 4000 frames but the body carries fewer — decode what's there
    // instead of indexing past the array (stereo 16-bit = 4 B/frame)
    val truncated = Multimodal.WavCodec.read(payload.dropRight(1000))
    assert(truncated.nFrames === 4000 - 250)
    assert(truncated.feature.forall(f => !f.isNaN && f >= 0f))
    // resize leaves audio rows untouched
    val resized = Multimodal.resize(media, 224, 224).collect().head
    assert(resized.payload sameElements payload)

    // resample: payload genuinely re-encoded at the new rate through
    // the JDK converter, and re-decodes through the same production
    // path with duration and energy envelope preserved
    val down = Multimodal.decode(
      Multimodal.resampleAudio(media, 4000f)).collect().head
    assert(down.height === 4000)
    // half the rate → about half the frames (converter may pad an edge
    // frame), same duration
    assert(math.abs(down.n_frames - 2000) <= 2)
    assert(down.width === 2) // channels preserved
    // the temporal envelope survives resampling: silent first segment,
    // staircase shape within tolerance of the original
    assert(down.feature(0) < 0.01f)
    for (s <- 1 until 8)
      assert(math.abs(down.feature(s) - m.feature(s)) < 0.03,
        s"segment $s: ${down.feature(s)} vs ${m.feature(s)}")
    // non-audio rows pass through untouched
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ibos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", ibos)
    val mixed = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, "image", ibos.toByteArray)))
    assert(Multimodal.resampleAudio(mixed, 4000f).collect()
      .head.payload sameElements ibos.toByteArray)
  }

  test("mixed corpus: GMM0 payloads and real PNGs dispatch per payload in one pass") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      100, 50, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    // a minimal real WAV (mono 8-bit 1 kHz, 100 silent frames) so all
    // THREE codecs dispatch inside one partition pass
    val wfmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      1000f, 8, 1, 1, 1000f, false)
    val wbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](100)(128.toByte)),
        wfmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wbos)
    // a GMM0 payload — the compressed-codec seam — hand-built, since
    // the synthetic corpus no longer needs the fake path at all
    val gmm = {
      val body = "seam".getBytes("UTF-8")
      val bb = java.nio.ByteBuffer.allocate(11 + body.length)
      bb.put("GMM0".getBytes("US-ASCII")).put(2.toByte)
        .putShort(320).putShort(240).putShort(12).put(body)
      bb.array()
    }
    val real = Multimodal.synthesize(spark, dir).limit(3).collect()
    val mixed = spark.createDataset(
      real.toSeq :+ Multimodal.MediaRow(9999L, "image", bos.toByteArray)
        :+ Multimodal.MediaRow(9998L, "audio", wbos.toByteArray)
        :+ Multimodal.MediaRow(9997L, "video", gmm))
    val meta = Multimodal.decode(mixed).collect().map(m => m.doc_id -> m).toMap
    assert(meta(9999L).width === 100 && meta(9999L).height === 50)
    assert(meta(9998L).fmt === "audio" && meta(9998L).height === 1000 &&
      meta(9998L).n_frames === 100)
    assert(meta(9998L).feature.forall(_ === 0f)) // silence has zero energy
    assert(meta(9997L).fmt === "video" && meta(9997L).width === 320 &&
      meta(9997L).n_frames === 12) // the seam still dispatches
    real.foreach { f =>
      assert(meta(f.doc_id).fmt === f.modality) // real paths unchanged
    }
  }

  test("resize rewrites image dimensions only, passes other modalities through") {
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.synthesize(spark, dir)
    val before = Multimodal.decode(media).collect()
      .map(m => m.doc_id -> m).toMap
    val resized = Multimodal.decode(
      Multimodal.resize(media, 224, 224)).collect()
    assert(resized.nonEmpty)
    resized.foreach { m =>
      val b = before(m.doc_id)
      if (m.modality == "image") {
        assert(m.width === 224 && m.height === 224)
        // the REAL resize path: genuinely re-encoded (PNG out), and the
        // perceptual grid features survive the rescale
        b.feature.zip(m.feature).foreach { case (x, y) =>
          assert(math.abs(x - y) < 0.08, s"feature drifted: $x vs $y")
        }
      } else {
        // untouched: same dims, same payload-derived features
        assert(m.width === b.width && m.height === b.height)
        assert(m.feature.toSeq === b.feature.toSeq)
      }
    }
  }

  test("square-wave WAV: real container, exact per-segment peaks") {
    import graft.multimodal.Multimodal
    // > 64 chars so the fingerprint prefix is full and a trailing
    // suffix provably cannot shift it
    val text = "The quick brown fox jumps over the lazy dog again and " +
      "again while more text trails"
    val frames = 320
    val wav = Multimodal.squareWavFromText(text, frames)
    // a REAL RIFF/WAVE container of the canonical size, decodable by
    // the production codec
    assert(Multimodal.WavCodec.isRealWav(wav))
    assert(wav.length === 44 + 2 * frames)
    val d = Multimodal.WavCodec.read(wav)
    assert(d.channels === 1 && d.sampleRate === 8000 &&
      d.nFrames === frames)
    // peaks8 recovers EXACTLY round(textAmps(s)·0.8·32767) — the
    // integer chain the oracle re-derives from text bytes (a square
    // wave's segment peak is its amplitude; every segment of ≥8
    // samples contains a nonzero-phase sample)
    val peaks = Multimodal.WavCodec.peaks8(wav)
    val expected = Multimodal.textAmps(text)
      .map(a => math.round(a * 0.8 * 32767))
    assert(peaks.toSeq === expected.toSeq)
    // and identical prefixes give identical peaks (the near-dup premise)
    val wav2 = Multimodal.squareWavFromText(text + " trailing tail", 200)
    assert(Multimodal.WavCodec.peaks8(wav2).toSeq === peaks.toSeq)
  }

  test("audio stats profile: mean/max/clip-rate replay from the codec") {
    import graft.multimodal.Multimodal
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.qAudioStats(spark, dir).collect()
    assert(out.nonEmpty)
    // replay ONE source driver-side through the real codec
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text", "n_chars", "source").collect()
    val src = out.head.getString(0)
    val mine = docs.filter(_.getString(3) == src)
    val peaks = mine.map { r =>
      Multimodal.WavCodec.peaks8(Multimodal.squareWavFromText(
        r.getString(1), (64 + (r.getLong(2) % 512)).toInt))
    }
    val r0 = out.head
    assert(r0.getLong(r0.fieldIndex("n_clips")) === mine.length.toLong)
    assert(r0.getLong(r0.fieldIndex("max_peak")) ===
      peaks.map(_.max).max)
    assert(r0.getLong(r0.fieldIndex("mean_peak")) ===
      math.round(peaks.flatten.map(_.toDouble).sum / (mine.length * 8.0)))
    val clipped = peaks.count(_.max >= Multimodal.peakFullScale)
    assert(r0.getLong(r0.fieldIndex("clip_rate_micro")) ===
      math.round(1e6 * clipped / mine.length.toDouble))
  }
}
