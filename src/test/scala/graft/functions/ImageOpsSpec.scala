package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL image decode path (javax.imageio PNG) and the dHash /
  * resize kernels that l10/l13/l67 run on executors.
  *
  * The pinned (hi, lo) dHash values below were produced by
  * tools/pin_l67.py — a from-scratch pure-Python PNG reader (stdlib zlib +
  * PNG filter reconstruction) plus an independent dHash implementation —
  * run against the exact PNG bytes this spec dumps to target/pngpin/. If
  * ImageIO mis-decoded, or decode were a stub, these would not match.
  */
class ImageOpsSpec extends AnyFunSuite {

  test("PNG round-trip is lossless: decoded pixels equal the synthesis formula") {
    for (seed <- Seq(0L, 17L, 499L); (w, h) <- Seq((24, 24), (56, 48), (33, 31))) {
      val img = ImageOps.decode(ImageOps.synthPng(w, h, seed))
      assert(img.getWidth == w && img.getHeight == h)
      assert(img.getRaster.getNumBands == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val g = ImageOps.pixelGray(x, y, seed)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == g, s"R at ($x,$y) seed=$seed")
        assert(((rgb >> 8) & 0xff) == (g + 85) % 256, s"G at ($x,$y)")
        assert((rgb & 0xff) == (g + 170) % 256, s"B at ($x,$y)")
      }
    }
  }

  test("dHash on a 36x32 block image equals the grid-arithmetic derivation") {
    for (docId <- Seq(0L, 1L, 5L, 42L, 403L)) {
      val (hi, lo) = ImageOps.dHash(ImageOps.decode(ImageOps.neardupPng(docId)))
      // independent derivation straight from the construction (mirrors the
      // l67 DuckDB oracle): cell (bx,cy) value is the block value, bit
      // cy*8+bx set when cell(bx) < cell(bx+1)
      val seed = docId / 4
      val k = (docId % 4).toInt
      def cell(bx: Int, cy: Int): Int = {
        val v = ImageOps.blockValue(bx, cy, seed)
        if (k > 0 && bx == (2 * k) % 9 && cy == (3 * k) % 8) 255 - v else v
      }
      var hash = 0L
      for (cy <- 0 until 8; bx <- 0 until 8)
        if (cell(bx, cy) < cell(bx + 1, cy)) hash |= 1L << (cy * 8 + bx)
      assert((hi, lo) == (hash >>> 32, hash & 0xffffffffL), s"doc $docId")
    }
  }

  test("near-dup structure: within-group hamming small, cross-group large") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val hs = (0L until 16L).map(id =>
      ImageOps.dHash(ImageOps.decode(ImageOps.neardupPng(id)))).toArray
    for (g <- 0 until 4; i <- 0 until 4; j <- i + 1 until 4)
      assert(ham(hs(g * 4 + i), hs(g * 4 + j)) <= 4,
        s"within group $g: docs ${g * 4 + i},${g * 4 + j}")
    val cross = for (a <- 0 until 4; b <- 4 until 8) yield ham(hs(a), hs(b))
    assert(cross.min > 6, s"cross-group collided: $cross")
  }

  test("nearest-neighbor resize samples the exact integer grid") {
    val img = ImageOps.decode(ImageOps.synthPng(56, 48, 7L))
    val r = ImageOps.resizeFit(img, 40)
    assert(r.getWidth == 40 && r.getHeight == 48 * 40 / 56)
    for (j <- 0 until r.getHeight; i <- 0 until r.getWidth)
      assert((r.getRGB(i, j) & 0xffffff) ==
        (img.getRGB(i * 56 / 40, j * 48 / r.getHeight) & 0xffffff))
    // no-op branch: already fits
    val small = ImageOps.decode(ImageOps.synthPng(24, 24, 3L))
    assert(ImageOps.resizeFit(small, 40) eq small)
  }

  test("decode handles the other JDK-native codecs: BMP lossless, JPEG structural") {
    val src = ImageOps.decode(ImageOps.synthPng(36, 32, 11L))
    def recode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // BMP is lossless RGB: full pixel identity through a second codec
    val bmp = ImageOps.decode(recode("bmp"))
    for (y <- 0 until 32; x <- 0 until 36)
      assert((bmp.getRGB(x, y) & 0xffffff) == (src.getRGB(x, y) & 0xffffff))
    // JPEG is lossy: dimensions and band structure must survive, pixels
    // only approximately (sanity: mean abs luma error under 16/255)
    val jpg = ImageOps.decode(recode("jpg"))
    assert(jpg.getWidth == 36 && jpg.getHeight == 32)
    val err = (for (y <- 0 until 32; x <- 0 until 36)
      yield math.abs(ImageOps.luma(jpg.getRGB(x, y)) - ImageOps.luma(src.getRGB(x, y)))).sum
    assert(err / (36 * 32) < 16, s"jpeg decode too far off: ${err / (36 * 32)}")
    // undecodable bytes raise loudly, never fabricate pixels
    intercept[IllegalArgumentException] {
      ImageOps.decode(Array[Byte](1, 2, 3, 4))
    }
  }

  test("decompression bomb: huge declared dimensions refuse before allocating") {
    // a syntactically valid PNG signature + IHDR declaring 100000x100000
    // (10 gigapixels from a ~60-byte payload) — the guard must fire off
    // the HEADER, before any raster allocation
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = new java.io.ByteArrayOutputStream()
    val id = new java.io.DataOutputStream(ihdr)
    id.writeBytes("IHDR"); id.writeInt(100000); id.writeInt(100000)
    id.write(8); id.write(2); id.write(0); id.write(0); id.write(0)
    val body = ihdr.toByteArray
    dos.writeInt(body.length - 4)
    dos.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    dos.writeInt(crc.getValue.toInt)
    val ex = intercept[IllegalArgumentException] {
      ImageOps.decode(bos.toByteArray)
    }
    assert(ex.getMessage.contains("decompression bomb"), ex.getMessage)
    // and a legitimate image still decodes through the same entry point
    assert(ImageOps.decode(ImageOps.synthPng(36, 32, 5L)).getWidth == 36)
  }

  test("l71 corpus: dHash is bit-identical under JPEG recompression (margin >= 23)") {
    // The margin-quantized corpus guarantees adjacent dHash cells differ
    // by >= 23 gray levels, so the hash survives any codec whose per-cell
    // mean error stays under ~11; measured drift at quality 0.9 is ZERO.
    // Sweep a spread of ids including ratchet-scale ones (the margin
    // argument is per-image, independent of corpus size).
    for (id <- (0L until 64L) ++ Seq(499L, 12345L, 499999L, 4999999L)) {
      val img = ImageOps.decode(ImageOps.jpegGatePng(id))
      val (phi, plo) = ImageOps.dHash(img)
      val (jhi, jlo) = ImageOps.dHash(ImageOps.decode(ImageOps.toJpeg(img)))
      assert((phi, plo) == (jhi, jlo), s"dHash drifted under JPEG for doc $id")
    }
    // the margin claim itself: every adjacent-cell delta >= 23, never 0
    for (seed <- 0L until 50L; cy <- 0 until 8; bx <- 0 until 8) {
      val a = ImageOps.marginBlockValue(bx, cy, seed)
      val b = ImageOps.marginBlockValue(bx + 1, cy, seed)
      assert(math.abs(a - b) >= 23, s"margin violated at ($bx,$cy) seed=$seed")
    }
    // and under the one-block inversion variants use (255-v stays on-margin):
    // adjacent cells always have opposite parity offsets, so an inverted
    // even-parity cell only ever neighbors odd-parity levels and vice versa
    val even = Seq(32, 80, 128, 176) // p=0 levels
    val odd = Seq(56, 104, 152, 200) // p=1 levels
    for (v <- even; n <- odd)
      assert(math.abs((255 - v) - n) >= 23, s"inverted $v vs neighbor $n")
    for (v <- odd; n <- even)
      assert(math.abs((255 - v) - n) >= 23, s"inverted $v vs neighbor $n")
  }

  test("GIF clip round-trip is lossless: every decoded frame equals the synthesis formula") {
    for (docId <- Seq(0L, 7L, 499L, 4999999L); nf <- Seq(4, 8)) {
      val frames = ImageOps.decodeGif(ImageOps.synthGif(docId, nf))
      assert(frames.length == nf, s"doc $docId: frame count")
      for (f <- 0 until nf; y <- 0 until 32; x <- 0 until 36)
        assert((frames(f).getRGB(x, y) & 0xff) ==
          ImageOps.blockValue(x / 4, y / 4, docId * 16 + f),
          s"doc $docId frame $f at ($x,$y)")
    }
  }

  test("GIF decode fails loudly on garbage, truncation and the frame-bomb bound") {
    intercept[IllegalArgumentException] {
      ImageOps.decodeGif(Array[Byte](1, 2, 3, 4))
    }
    val ok = ImageOps.synthGif(3L, 6)
    // truncated container: the JDK reader silently returns only complete
    // frames, so the trailer guard must raise instead of losing frames.
    // 0x3b is legal INSIDE LZW data (a prefix can end on one by luck — the
    // guard is necessary-not-sufficient; callers pin the frame COUNT, as
    // l72 does in-task), so cut where the last byte is not a fake trailer
    // (the guard also skips trailing NUL padding, so not a fake zero
    // either).
    var cut = ok.length / 2
    while ((ok(cut - 1) & 0xff) == 0x3b || ok(cut - 1) == 0) cut -= 1
    val te = intercept[IllegalArgumentException] {
      ImageOps.decodeGif(java.util.Arrays.copyOf(ok, cut))
    }
    assert(te.getMessage.contains("truncated GIF"), te.getMessage)
    // crawl-realistic payload: trailing zero padding AFTER the trailer
    // must still decode (the trailer is found by the backward scan)
    assert(ImageOps.decodeGif(
      java.util.Arrays.copyOf(ok, ok.length + 16)).length == 6)
    val ex = intercept[IllegalArgumentException] {
      ImageOps.decodeGif(ok, maxFrames = 4)
    }
    assert(ex.getMessage.contains("decode bound"), ex.getMessage)
    assert(ImageOps.decodeGif(ok).length == 6)
  }

  test("dHash pinned by the independent Python PNG decoder (tools/pin_l67.py)") {
    // keep the byte-level artifacts reproducible for the Python tool
    val dir = java.nio.file.Paths.get("target/pngpin")
    java.nio.file.Files.createDirectories(dir)
    val ids = Seq(0L, 1L, 2L, 3L, 7L, 42L, 123L, 499L)
    ids.foreach { id =>
      java.nio.file.Files.write(dir.resolve(s"$id.png"), ImageOps.neardupPng(id))
    }
    val got = ids.map { id =>
      val (hi, lo) = ImageOps.dHash(ImageOps.decode(ImageOps.neardupPng(id)))
      (id, hi, lo)
    }
    val pinned = Seq( // output of: python3 tools/pin_l67.py target/pngpin
      (0L, 2344013139L, 698521675L),
      (1L, 2344013139L, 765630539L),
      (2L, 2343488851L, 698521675L),
      (3L, 2344013139L, 698521675L),
      (7L, 3043649118L, 2867164261L),
      (42L, 3536692661L, 324577957L),
      (123L, 2788845987L, 2588320790L),
      (499L, 341447829L, 755719404L))
    assert(got == pinned)
  }
}
