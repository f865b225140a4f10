package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("synthesize -> decode roundtrip: meta matches the encoded header") {
    val media = Multimodal.synthesize(spark, dir)
    val meta = Multimodal.decode(media).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(Seq("image", "audio", "video").contains(m.fmt))
      assert(m.modality === m.fmt) // synthesized modality survives decode
      assert(m.width >= 64 && m.height >= 64)
      assert(m.feature.length === 8)
      assert(m.n_bytes > 11)
      if (m.fmt != "video") assert(m.n_frames === 1)
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
        assert(m.n_bytes === b.n_bytes) // stub re-encode keeps the body
      } else {
        // untouched: same dims, same payload-derived features
        assert(m.width === b.width && m.height === b.height)
        assert(m.feature.toSeq === b.feature.toSeq)
      }
    }
  }
}
