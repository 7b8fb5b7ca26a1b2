package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

/** Pins the from-scratch GIF/LZW fast path in [[ImageOps.decodeGif]]
  * frame-for-frame, pixel-for-pixel against the javax.imageio reader —
  * the decode-values contract l72 and the video ratchet rest on. The
  * vectors are chosen to exercise the LZW decoder's distinct regimes:
  * constant frames (KwK chains), noise frames (dictionary growth to the
  * width-widening boundaries), frames large enough to fill the 4096-entry
  * table and force mid-stream clear codes, and mixed frame sizes.
  */
class GifDecodeSpec extends AnyFunSuite {

  private def viaImageIO(b: Array[Byte]): IndexedSeq[BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(b))
    try {
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      try {
        r.setInput(iis)
        (0 until r.getNumImages(true)).map(r.read(_))
      } finally r.dispose()
    } finally iis.close()
  }

  private def assertFramesEqual(b: Array[Byte], label: String): Unit = {
    val fast = ImageOps.decodeGif(b)
    val ref = viaImageIO(b)
    assert(fast.length == ref.length, s"$label: frame count differs")
    fast.indices.foreach { f =>
      val a = fast(f); val r = ref(f)
      assert(a.getWidth == r.getWidth && a.getHeight == r.getHeight,
        s"$label: frame $f dimensions differ")
      var y = 0
      while (y < r.getHeight) {
        var x = 0
        while (x < r.getWidth) {
          assert(a.getRGB(x, y) == r.getRGB(x, y),
            s"$label: frame $f pixel ($x,$y) fast=0x${a.getRGB(x, y).toHexString}" +
              s" imageio=0x${r.getRGB(x, y).toHexString}")
          x += 1
        }
        y += 1
      }
    }
  }

  private def writeSeq(frames: Seq[BufferedImage]): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach(f =>
        w.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  private def noiseFrame(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    val raster = img.getRaster
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (x * 73856093L + y * 19349663L + seed * 83492791L) % 1000003L
        raster.setSample(x, y, 0, (((v * v + v * 7919L) % 1000003L) % 216L).toInt)
      }
    }
    img
  }

  test("graded synthGif clips decode frame-identically to imageio") {
    Seq(0L, 3L, 11L, 42L).foreach { id =>
      assertFramesEqual(ImageOps.synthGif(id, 4 + (id % 5).toInt), s"synth $id")
    }
  }

  test("the graded profile rides the fast path, not the fallback") {
    // the fast path materializes TYPE_INT_RGB; the imageio fallback yields
    // TYPE_BYTE_INDEXED — a silent fallback would still be correct but
    // would void the perf claim, so pin the route
    val fs = ImageOps.decodeGif(ImageOps.synthGif(3L, 5))
    assert(fs.forall(_.getType == BufferedImage.TYPE_INT_RGB),
      s"synthGif decoded via fallback (type=${fs.head.getType})")
  }

  test("constant-color frames (KwK-heavy streams) match imageio") {
    val frames = (0 until 3).map { i =>
      val img = new BufferedImage(40, 30, BufferedImage.TYPE_BYTE_INDEXED)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(40 * i + 20, 40 * i + 20, 40 * i + 20))
      g.fillRect(0, 0, 40, 30); g.dispose()
      img
    }
    assertFramesEqual(writeSeq(frames), "constant")
  }

  test("noise frames big enough to fill the LZW table match imageio") {
    // 200x150 of 216-color noise fills the 4096-entry table several times
    // over, forcing mid-stream clear codes and every code width up to 12
    assertFramesEqual(writeSeq(Seq(noiseFrame(200, 150, 1L),
      noiseFrame(200, 150, 2L))), "noise big")
  }

  test("mixed frame sizes match imageio") {
    assertFramesEqual(writeSeq(Seq(noiseFrame(36, 32, 3L),
      noiseFrame(17, 9, 4L), noiseFrame(64, 5, 5L))), "mixed sizes")
  }

  test("transparent-index GIF falls back to imageio and still matches it") {
    val r = Array.tabulate[Byte](256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, r, r, r, 7)
    val img = new BufferedImage(20, 12, BufferedImage.TYPE_BYTE_INDEXED, icm)
    (0 until 12).foreach(y => (0 until 20).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 5 + y) % 256)))
    assertFramesEqual(writeSeq(Seq(img)), "transparent fallback")
  }

  test("mangled-but-trailered stream behaves exactly like the old path") {
    // a cut stream with a re-appended trailer defeats the trailer check by
    // construction (documented necessary-not-sufficient); the pin here is
    // PARITY: the fast path must either fall back (imageio's outcome,
    // loud or lenient, is the behavior) or produce imageio's exact frames
    val b = ImageOps.synthGif(9L, 4)
    val cut = java.util.Arrays.copyOf(b, b.length - 40)
    cut(cut.length - 1) = 0x3b.toByte
    val ref = try Right(viaImageIO(cut)) catch { case e: Exception => Left(e) }
    val fast = try Right(ImageOps.decodeGif(cut)) catch { case e: Exception => Left(e) }
    (ref, fast) match {
      case (Right(r), Right(f)) =>
        assert(f.length == r.length, "mangled: frame count differs")
      case (Left(_), Left(_)) => () // both loud
      case other => fail(s"mangled: behaviors diverge: $other")
    }
  }

  test("frame-bomb bound still fires before raster work") {
    val b = ImageOps.synthGif(2L, 6)
    val e = intercept[IllegalArgumentException](ImageOps.decodeGif(b, maxFrames = 5))
    assert(e.getMessage.contains("decode bound"))
  }
}
