package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK video container support: AVI is RIFF (the same container
  * family as WAV — reference: the public AVI RIFF spec, msdn
  * `AVIMAINHEADER`/`AVISTREAMHEADER`/`BITMAPINFOHEADER` layouts), and
  * two frame codings need no native codec at all:
  *
  *  - uncompressed DIB frames (`00db` chunks, BI_RGB bottom-up BGR
  *    rows) — plain pixels, parsed directly;
  *  - MJPEG frames (`00dc` chunks) — each chunk IS a standalone JPEG,
  *    which `javax.imageio` decodes.
  *
  * So the "video seam" is narrower than 'no in-JDK codec': container
  * parse, frame walk, frame decode (DIB + MJPEG), frame sampling and
  * temporal features are all REAL here; only compressed inter-frame
  * codecs (H.264 etc.) remain behind [[Multimodal.FakeCodec]]'s
  * documented seam.
  *
  * Writer layout is canonical and SIZE-EXACT: for `f` DIB frames of
  * `w`×`h`, total bytes = 232 + f·(24 + frameSize) with
  * frameSize = ((3w+3)/4)·4·h — RIFF hdr 12 + hdrl LIST 200 + movi
  * LIST (12 + f·(8+frameSize)) + idx1 (8 + 16f). The driver oracle
  * replays exactly this arithmetic ([[Multimodal.qMultimodalDecodeSql]]),
  * proving the engine's real container round-trip the same way the WAV
  * formula does for audio.
  */
object AviCodec {

  def isRealAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** Padded BGR row width of a 24-bit DIB. */
  def rowBytes(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** DIB frame byte size (always even: row padding is 4-aligned). */
  def frameSize(w: Int, h: Int): Int = rowBytes(w) * h

  /** Exact writer output size for `f` DIB frames of w×h. */
  def aviSize(w: Int, h: Int, f: Int): Long =
    232L + f.toLong * (24L + frameSize(w, h))

  /** Write an uncompressed-DIB AVI: every frame's pixel (x, y) is the
    * gray level `grayAt(frameIdx, x, y)` (0–255). Canonical layout per
    * the scaladoc — [[aviSize]] is asserted at the end so the formula
    * and the writer can never drift apart. */
  def write(w: Int, h: Int, frames: Int, fps: Int,
            grayAt: (Int, Int, Int) => Int): Array[Byte] = {
    val fs = frameSize(w, h)
    val total = aviSize(w, h, frames)
    require(total <= Int.MaxValue, s"AVI too large: $total")
    val bb = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    // RIFF header
    fourcc("RIFF"); bb.putInt(total.toInt - 8); fourcc("AVI ")
    // LIST hdrl (content: "hdrl" + avih(64) + LIST strl(124) = 192)
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps) // dwMicroSecPerFrame
    bb.putInt(0)             // dwMaxBytesPerSec
    bb.putInt(0)             // dwPaddingGranularity
    bb.putInt(0x10)          // dwFlags = AVIF_HASINDEX
    bb.putInt(frames)        // dwTotalFrames
    bb.putInt(0)             // dwInitialFrames
    bb.putInt(1)             // dwStreams
    bb.putInt(fs + 8)        // dwSuggestedBufferSize
    bb.putInt(w); bb.putInt(h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // reserved
    // LIST strl (content: "strl" + strh(64) + strf(48) = 116)
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0)                      // dwFlags
    bb.putShort(0); bb.putShort(0)    // wPriority, wLanguage
    bb.putInt(0)                      // dwInitialFrames
    bb.putInt(1); bb.putInt(fps)      // dwScale, dwRate
    bb.putInt(0); bb.putInt(frames)   // dwStart, dwLength
    bb.putInt(fs + 8)                 // dwSuggestedBufferSize
    bb.putInt(-1); bb.putInt(0)       // dwQuality, dwSampleSize
    bb.putShort(0); bb.putShort(0)    // rcFrame
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40)                     // biSize
    bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24)   // biPlanes, biBitCount
    bb.putInt(0)                      // biCompression = BI_RGB
    bb.putInt(fs)                     // biSizeImage
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    // LIST movi
    fourcc("LIST"); bb.putInt(4 + frames * (8 + fs)); fourcc("movi")
    var fi = 0
    while (fi < frames) {
      fourcc("00db"); bb.putInt(fs)
      // bottom-up rows, BGR, gray ⇒ all three channels equal
      var y = h - 1
      while (y >= 0) {
        var x = 0
        var rowFill = 0
        while (x < w) {
          val g = (grayAt(fi, x, y) & 0xFF).toByte
          bb.put(g); bb.put(g); bb.put(g)
          rowFill += 3
          x += 1
        }
        while (rowFill < rowBytes(w)) { bb.put(0.toByte); rowFill += 1 }
        y -= 1
      }
      fi += 1
    }
    // idx1: one entry per frame, offsets relative to the movi data
    // start (position of the fourcc counts as offset 0, so the first
    // frame chunk sits at offset 4)
    fourcc("idx1"); bb.putInt(16 * frames)
    fi = 0
    while (fi < frames) {
      fourcc("00db"); bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(4 + fi * (8 + fs)); bb.putInt(fs)
      fi += 1
    }
    val out = bb.array()
    require(bb.position() == total.toInt,
      s"AVI writer drifted from aviSize: ${bb.position()} vs $total")
    out
  }

  /** MJPEG variant: every frame chunk is a complete JPEG (`00dc`),
    * fccHandler/biCompression = 'MJPG', chunks padded to even length
    * per RIFF. Frame sizes are whatever the JPEG encoder produced — no
    * size formula here (that is exactly why the size-exact synthetic
    * corpus uses DIB); the PARSER handles both codings identically. */
  def writeMjpeg(w: Int, h: Int, fps: Int,
                 jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val f = jpegFrames.length
    val padded = jpegFrames.map(j => j.length + (j.length & 1))
    val moviContent = 4 + padded.map(_ + 8).sum
    val total = 12 + 200 + (8 + moviContent) + (8 + 16 * f)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps); bb.putInt(0); bb.putInt(0); bb.putInt(0x10)
    bb.putInt(f); bb.putInt(0); bb.putInt(1)
    bb.putInt(padded.maxOption.getOrElse(0) + 8)
    bb.putInt(w); bb.putInt(h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    bb.putInt(0); bb.putShort(0); bb.putShort(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(fps); bb.putInt(0); bb.putInt(f)
    bb.putInt(padded.maxOption.getOrElse(0) + 8)
    bb.putInt(-1); bb.putInt(0)
    bb.putShort(0); bb.putShort(0)
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24)
    fourcc("MJPG") // biCompression
    bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(moviContent); fourcc("movi")
    jpegFrames.foreach { j =>
      fourcc("00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte)
    }
    fourcc("idx1"); bb.putInt(16 * f)
    var off = 4
    jpegFrames.zip(padded).foreach { case (j, pl) =>
      fourcc("00dc"); bb.putInt(0x10); bb.putInt(off); bb.putInt(j.length)
      off += 8 + pl
    }
    require(bb.position() == total,
      s"MJPEG AVI writer drift: ${bb.position()} vs $total")
    bb.array()
  }

  /** One parsed frame: the chunk id tells the coding (`db` = DIB,
    * `dc` = compressed/MJPEG), `data` is the raw chunk payload. */
  final case class FrameChunk(isDib: Boolean, data: Array[Byte])

  final case class Parsed(width: Int, height: Int, bitCount: Int,
                          declaredFrames: Int, frames: Vector[FrameChunk])

  /** Walk the RIFF tree: read strf's BITMAPINFOHEADER for dimensions,
    * collect every `##db`/`##dc` chunk under LIST movi. Chunk walking
    * honors even padding; a truncated payload yields the frames that
    * fully fit (same trust-the-bytes rule as the WAV reader). */
  def parse(p: Array[Byte]): Parsed = {
    require(isRealAvi(p), "not a RIFF/AVI payload")
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var width = 0; var height = 0; var bitCount = 0; var declared = 0
    val frames = Vector.newBuilder[FrameChunk]
    def fourccAt(o: Int): String =
      new String(p, o, 4, "US-ASCII")
    // walk chunks in [from, to); descend into LISTs
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to && o + 8 <= p.length) {
        val id = fourccAt(o)
        val size = bb.getInt(o + 4)
        if (size < 0 || o + 8 > p.length) return
        val dataEnd = math.min(math.min(o + 8L + size, to.toLong),
          p.length.toLong).toInt
        id match {
          case "LIST" if dataEnd - (o + 8) >= 4 =>
            walk(o + 12, dataEnd) // skip the 4-byte list type
          case "strf" if dataEnd - (o + 8) >= 24 =>
            width = bb.getInt(o + 8 + 4)
            height = bb.getInt(o + 8 + 8)
            bitCount = bb.getShort(o + 8 + 14).toInt
          case "avih" if dataEnd - (o + 8) >= 20 =>
            declared = bb.getInt(o + 8 + 16)
          case _ if id.length == 4 && id(2) == 'd' &&
              (id(3) == 'b' || id(3) == 'c') &&
              id(0).isDigit && id(1).isDigit =>
            if (o + 8 + size <= p.length) // complete frames only
              frames += FrameChunk(id(3) == 'b',
                java.util.Arrays.copyOfRange(p, o + 8, o + 8 + size))
          case _ => ()
        }
        o = o + 8 + size + (size & 1) // even padding
      }
    }
    walk(12, p.length)
    Parsed(width, height, bitCount, declared, frames.result())
  }

  /** Mean luminance (0–255) of one frame; DIB parsed directly, MJPEG
    * through ImageIO. */
  private def frameLuminance(fc: FrameChunk, w: Int, h: Int): Double =
    if (fc.isDib) {
      val rb = rowBytes(w)
      var sum = 0.0
      var y = 0
      var n = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val off = y * rb + 3 * x
          if (off + 2 < fc.data.length) {
            val b = fc.data(off) & 0xFF
            val g = fc.data(off + 1) & 0xFF
            val r = fc.data(off + 2) & 0xFF
            sum += (299 * r + 587 * g + 114 * b) / 1000.0
            n += 1
          }
          x += 1
        }
        y += 1
      }
      if (n == 0) 0.0 else sum / n
    } else {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fc.data))
      require(img != null, "unreadable MJPEG frame")
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000.0
          x += 1
        }
        y += 1
      }
      sum / (img.getWidth.toLong * img.getHeight)
    }

  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           feature: Array[Float])

  /** Decode once: dimensions from strf, frame count from the chunks
    * actually present (truncation-tolerant, like the WAV reader), and
    * the temporal feature — mean luminance over 8 equal time segments,
    * normalized to [0, 1] — the video analogue of the audio RMS
    * envelope and the image grid luminance. */
  def read(p: Array[Byte]): Decoded = {
    val parsed = parse(p)
    val n = parsed.frames.length
    val sums = new Array[Double](8)
    val cnts = new Array[Int](8)
    var i = 0
    while (i < n) {
      val seg = math.min(7L, i.toLong * 8 / math.max(1, n)).toInt
      sums(seg) += frameLuminance(parsed.frames(i), parsed.width,
        parsed.height)
      cnts(seg) += 1
      i += 1
    }
    val feature = sums.indices.map(s =>
      if (cnts(s) == 0) 0f else (sums(s) / cnts(s) / 255.0).toFloat).toArray
    Decoded(parsed.width, parsed.height, n, feature)
  }

  /** REAL frame extraction: every k-th frame as a standalone image
    * payload [[ImageIoCodec]] can decode — DIB chunks wrapped into a
    * proper BMP file (14-byte file header + the 40-byte info header +
    * pixel data, exactly [[BmpImage.size]] bytes), MJPEG chunks
    * returned verbatim (they already ARE JPEGs). */
  def extractFrames(p: Array[Byte], k: Int): Seq[(Int, Array[Byte])] = {
    val parsed = parse(p)
    (0 until parsed.frames.length by k).map { i =>
      val fc = parsed.frames(i)
      val bytes =
        if (fc.isDib) BmpImage.wrapDib(parsed.width, parsed.height, fc.data)
        else fc.data
      (i, bytes)
    }
  }
}

/** Hand-rolled 24-bit BI_RGB BMP writer — 54-byte header + padded
  * bottom-up BGR rows, so the payload size is the exact formula
  * size(w, h) = 54 + rowBytes(w)·h (the oracle replays it) and
  * `javax.imageio` reads the result back. */
object BmpImage {

  def size(w: Int, h: Int): Long = 54L + AviCodec.rowBytes(w).toLong * h

  /** Build a BMP whose pixel (x, y) — y top-down — is the gray level
    * `grayAt(x, y)`. */
  def bytes(w: Int, h: Int, grayAt: (Int, Int) => Int): Array[Byte] = {
    val rb = AviCodec.rowBytes(w)
    val dib = new Array[Byte](rb * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (grayAt(x, y) & 0xFF).toByte
        val off = (h - 1 - y) * rb + 3 * x // bottom-up storage
        dib(off) = g; dib(off + 1) = g; dib(off + 2) = g
        x += 1
      }
      y += 1
    }
    wrapDib(w, h, dib)
  }

  /** Wrap raw bottom-up BGR DIB pixel data (already row-padded) into a
    * complete BMP file. */
  def wrapDib(w: Int, h: Int, dib: Array[Byte]): Array[Byte] = {
    val total = 54 + dib.length
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(total); bb.putShort(0); bb.putShort(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24)
    bb.putInt(0); bb.putInt(dib.length)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.put(dib)
    bb.array()
  }
}
