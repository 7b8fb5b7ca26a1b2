package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the from-scratch PNG fast path in [[ImageOps.decode]] pixel-for-
  * pixel against javax.imageio — the decode-values contract every image
  * oracle (l10/l13/l67/l68/l71) rests on. Coverage is deliberate, not
  * incidental: each of the five PNG filter types gets a hand-encoded
  * vector (the JDK writer picks filters adaptively, so writer-produced
  * bytes alone cannot prove filter coverage), for both the RGB and RGBA
  * profiles the fast path claims.
  */
class PngDecodeSpec extends AnyFunSuite {

  private def viaImageIO(b: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new ByteArrayInputStream(b))

  private def assertPixelEqual(b: Array[Byte], label: String): Unit = {
    val fast = ImageOps.decode(b)
    val ref = viaImageIO(b)
    assert(fast.getWidth == ref.getWidth && fast.getHeight == ref.getHeight,
      s"$label: dimensions differ")
    var y = 0
    while (y < ref.getHeight) {
      var x = 0
      while (x < ref.getWidth) {
        assert(fast.getRGB(x, y) == ref.getRGB(x, y),
          s"$label: pixel ($x,$y) fast=0x${fast.getRGB(x, y).toHexString} " +
            s"imageio=0x${ref.getRGB(x, y).toHexString}")
        x += 1
      }
      y += 1
    }
  }

  /** Minimal spec-conformant PNG encoder with a FIXED filter type per row
    * (zlib via Deflater, real CRCs), so each filter is provably exercised.
    */
  private def encodePng(w: Int, h: Int, colorType: Int, filter: Int,
      rgb: (Int, Int) => Int): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 4
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = rgb(x, y)
        cur(x * bpp) = (v >> 16) & 0xff
        cur(x * bpp + 1) = (v >> 8) & 0xff
        cur(x * bpp + 2) = v & 0xff
        if (bpp == 4) cur(x * bpp + 3) = (v >>> 24) & 0xff
        x += 1
      }
      val rs = y * (stride + 1)
      raw(rs) = filter.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b2 = if (y > 0) prev(i) else 0
        val c = if (y > 0 && i >= bpp) prev(i - bpp) else 0
        val enc = filter match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b2
          case 3 => cur(i) - ((a + b2) >> 1)
          case 4 =>
            val p = a + b2 - c
            val pa = math.abs(p - a); val pb = math.abs(p - b2)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b2 else c
            cur(i) - pred
        }
        raw(rs + 1 + i) = enc.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new Array[Byte](raw.length + 64)
    val n = d.deflate(comp)
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def be32(v: Int) = { ihdr.write(v >> 24); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff) }
    be32(w); be32(h)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", java.util.Arrays.copyOf(comp, n))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def noise(x: Int, y: Int): Int = {
    val v = (x * 73856093L + y * 19349663L + 12345L) % 1000003L
    (((v * v + v * 7919L) % 16777216L)).toInt
  }

  test("all five filter types decode pixel-identically to imageio (RGB)") {
    (0 to 4).foreach { f =>
      assertPixelEqual(encodePng(23, 17, 2, f, (x, y) => noise(x, y)),
        s"rgb filter $f")
    }
  }

  test("all five filter types decode pixel-identically to imageio (RGBA)") {
    (0 to 4).foreach { f =>
      assertPixelEqual(
        encodePng(19, 13, 6, f,
          (x, y) => (((x + y) % 256) << 24) | (noise(x, y) & 0xffffff)),
        s"rgba filter $f")
    }
  }

  test("writer-produced corpora decode pixel-identically to imageio") {
    // the actual graded generators (JDK writer output, adaptive filters)
    Seq(0L, 1L, 2L, 7L, 41L).foreach { id =>
      assertPixelEqual(ImageOps.neardupPng(id), s"neardup $id")
      assertPixelEqual(ImageOps.jpegGatePng(id), s"jpegGate $id")
    }
    Seq((24, 24, 3L), (56, 48, 9L), (64, 44, 123L)).foreach { case (w, h, s) =>
      assertPixelEqual(ImageOps.synthPng(w, h, s), s"synth ${w}x$h")
    }
    // an ARGB image through the JDK writer (color type 6 profile)
    val img = new BufferedImage(21, 15, BufferedImage.TYPE_INT_ARGB)
    (0 until 15).foreach(y => (0 until 21).foreach(x =>
      img.setRGB(x, y, (((x * 11 + y) % 256) << 24) | (noise(x, y) & 0xffffff))))
    assertPixelEqual(ImageOps.toPng(img), "writer argb")
  }

  test("gray PNG falls back to imageio and still matches it") {
    val img = new BufferedImage(17, 11, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 11).foreach(y => (0 until 17).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)))
    assertPixelEqual(ImageOps.toPng(img), "gray fallback")
  }

  test("truncated IDAT fails loudly") {
    val b = ImageOps.neardupPng(5L)
    // cut the stream inside the IDAT payload (keep chunk framing parseable
    // is NOT required: either parse rejects or inflate ends early — both
    // must throw, never fabricate pixels)
    val cut = java.util.Arrays.copyOf(b, b.length - 16)
    intercept[Exception](ImageOps.decode(cut))
  }

  test("zlib-corrupt IDAT fails loudly") {
    val b = ImageOps.neardupPng(6L)
    // find IDAT and flip bytes mid-payload
    var i = 8
    var idat = -1
    while (idat < 0 && i + 8 < b.length) {
      if (b(i + 4) == 'I' && b(i + 5) == 'D' && b(i + 6) == 'A' && b(i + 7) == 'T')
        idat = i
      else {
        val len = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
          ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        i += 12 + len
      }
    }
    assert(idat > 0)
    val bad = b.clone()
    bad(idat + 12) = (bad(idat + 12) ^ 0x5f).toByte
    bad(idat + 13) = (bad(idat + 13) ^ 0x3a).toByte
    intercept[Exception](ImageOps.decode(bad))
  }

  test("decompression-bomb guard fires before raster allocation") {
    // hand-built header declaring a gigapixel canvas with a tiny payload
    val bomb = encodePng(8, 8, 2, 0, (_, _) => 0x112233)
    // patch IHDR dims to 100000 x 100000 and leave the rest
    def put32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v >> 24).toByte; a(off + 1) = (v >> 16).toByte
      a(off + 2) = (v >> 8).toByte; a(off + 3) = v.toByte
    }
    put32(bomb, 16, 100000); put32(bomb, 20, 100000)
    val e = intercept[IllegalArgumentException](ImageOps.decode(bomb))
    assert(e.getMessage.contains("decompression bomb"))
  }
}
