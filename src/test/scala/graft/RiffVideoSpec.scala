package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, BmpImage}

/** Round-trips for the pure-JDK AVI/BMP layer: the writer's size
  * formula, the parser's frame walk, DIB and MJPEG codings, frame
  * extraction to ImageIO-decodable payloads, truncation tolerance. */
class RiffVideoSpec extends AnyFunSuite {

  private def gray(f: Int, x: Int, y: Int): Int = (10 * f + x + y) % 256

  test("DIB write -> parse -> read round-trips dims, frames, pixels") {
    val (w, h, n) = (13, 7, 6) // odd width exercises row padding
    val p = AviCodec.write(w, h, n, 10, gray)
    assert(p.length.toLong === AviCodec.aviSize(w, h, n))
    assert(AviCodec.isRealAvi(p))
    val d = AviCodec.read(p)
    assert((d.width, d.height, d.nFrames) === ((w, h, n)))
    // luminance of frame f = mean over pixels of gray(f,x,y) (equal
    // RGB channels make luminance = gray exactly)
    val wantLum = (0 until n).map(f =>
      (for { y <- 0 until h; x <- 0 until w } yield gray(f, x, y))
        .sum.toDouble / (w * h))
    // 8 segments over 6 frames: seg(f) = f*8/6
    val segs = (0 until n).groupBy(f => math.min(7, f * 8 / n))
    (0 until 8).foreach { s =>
      val want = segs.get(s).map(fs =>
        fs.map(wantLum).sum / fs.size / 255.0).getOrElse(0.0)
      assert(math.abs(d.feature(s) - want) < 1e-6,
        s"segment $s: ${d.feature(s)} vs $want")
    }
  }

  test("extractFrames wraps DIB frames into BMPs ImageIO decodes") {
    val (w, h, n) = (10, 5, 9)
    val p = AviCodec.write(w, h, n, 10, gray)
    val frames = AviCodec.extractFrames(p, 4)
    assert(frames.map(_._1) === Seq(0, 4, 8))
    frames.foreach { case (fi, bytes) =>
      assert(bytes.length.toLong === BmpImage.size(w, h))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      assert((img.getWidth, img.getHeight) === ((w, h)))
      // spot-check pixels (top-down visual coordinates)
      for { y <- Seq(0, h - 1); x <- Seq(0, w - 1) } {
        val g = gray(fi, x, y)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) === g)
        assert((rgb & 0xFF) === g)
      }
    }
  }

  test("MJPEG write -> parse: chunks come back verbatim and decode") {
    val imgs = (0 until 3).map { f =>
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for { y <- 0 until 8; x <- 0 until 16 }
        im.setRGB(x, y, gray(f, x, y) * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val p = AviCodec.writeMjpeg(16, 8, 10, imgs)
    assert(AviCodec.isRealAvi(p))
    val parsed = AviCodec.parse(p)
    assert((parsed.width, parsed.height) === ((16, 8)))
    assert(parsed.frames.length === 3)
    parsed.frames.zip(imgs).foreach { case (fc, j) =>
      assert(!fc.isDib)
      assert(fc.data.toSeq === j.toSeq)
    }
    val d = AviCodec.read(p) // luminance through the ImageIO path
    assert(d.nFrames === 3)
    assert(d.feature.exists(_ > 0f))
    // extraction returns the JPEG bytes as-is
    val ex = AviCodec.extractFrames(p, 2)
    assert(ex.map(_._1) === Seq(0, 2))
    ex.foreach { case (_, bytes) =>
      assert(bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte)
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) != null)
    }
  }

  test("truncated AVI yields only the frames that fully fit") {
    val (w, h, n) = (8, 8, 5)
    val p = AviCodec.write(w, h, n, 10, gray)
    // cut mid-way through the 4th frame chunk
    val fs = AviCodec.frameSize(w, h)
    val cut = 12 + 200 + 12 + 3 * (8 + fs) + 8 + fs / 2
    val d = AviCodec.read(java.util.Arrays.copyOfRange(p, 0, cut))
    assert(d.nFrames === 3)
    assert((d.width, d.height) === ((w, h)))
  }

  test("BmpImage size formula matches the bytes and ImageIO agrees") {
    val (w, h) = (19, 11) // odd width -> padded rows
    val b = BmpImage.bytes(w, h, (x, y) => (x * 7 + y * 3) % 256)
    assert(b.length.toLong === BmpImage.size(w, h))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b))
    assert((img.getWidth, img.getHeight) === ((w, h)))
    for { y <- Seq(0, 5, h - 1); x <- Seq(0, 9, w - 1) } {
      val g = (x * 7 + y * 3) % 256
      assert((img.getRGB(x, y) & 0xFF) === g)
    }
  }
}
