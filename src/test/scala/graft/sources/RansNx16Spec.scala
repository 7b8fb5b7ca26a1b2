package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** rANS Nx16 (CRAM 3.1) known-answer tests. The vectors in
  * ransnx16_vectors.txt were produced by tools/ransnx16.py — an
  * INDEPENDENT encoder+decoder written from the public CRAMcodecs spec,
  * not from the Scala code — covering every flag combination: order-0/1,
  * 4- and 32-way interleave, STRIPE, CAT, RLE (with uint7 run lengths),
  * PACK (2-bit alphabet), PACK+RLE composition, NOSZ, compressed order-1
  * frequency tables, plus the mod-N tail and degenerate single-symbol /
  * 2-byte inputs. CramSpec's 3.1 fixtures then prove the same decoder
  * end-to-end inside real containers.
  */
class RansNx16Spec extends AnyFunSuite {
  private val NOSZ = 16

  private val vectors: Seq[(String, Int, Int, Array[Byte], Array[Byte])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/ransnx16_vectors.txt"), "US-ASCII")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, flags, len, enc, data) = line.split(" ")
      (name, flags.toInt, len.toInt,
        java.util.Base64.getDecoder.decode(enc),
        java.util.Base64.getDecoder.decode(data))
    }.toSeq
    finally src.close()
  }

  test("vectors cover all transform flags") {
    val seen = vectors.map(_._2).reduce(_ | _)
    assert((seen & 0xFD) == 0xFD) // every flag except X32|STRIPE combined
    assert(vectors.size >= 16)
  }

  for ((name, flags, len, enc, data) <- vectors) {
    test(s"nx16 decode: $name (flags=$flags, ${data.length} bytes)") {
      val known = if ((flags & NOSZ) != 0) len else -1
      val got = graft.sources.formats.RansNx16.decode(enc, known)
      assert(got.sameElements(data), s"decode mismatch for $name")
      // the same stream through the CRAM block-codec entry point (method 5)
      val viaBlock = graft.sources.formats.CramFormat.decompress(5, enc, len)
      assert(viaBlock.sameElements(data))
    }
  }

  test("NOSZ stream without an external size fails loudly") {
    val noszStream = vectors.find(_._1 == "nosz_text").get._4
    val e = intercept[IllegalArgumentException](
      graft.sources.formats.RansNx16.decode(noszStream, -1))
    assert(e.getMessage.contains("NOSZ"))
  }

  test("random single-byte corruption never hangs; failures are exceptions, not errors") {
    val rnd = new scala.util.Random(2468)
    for ((_, flags, len, enc, _) <- vectors.take(6) if enc.length > 8; _ <- 0 until 40) {
      val b = enc.clone()
      val pos = 4 + rnd.nextInt(b.length - 4) // past flags + size varint
      b(pos) = rnd.nextInt(256).toByte
      try {
        graft.sources.formats.RansNx16.decode(b, if ((flags & NOSZ) != 0) len else -1)
        () // silent wrong output is acceptable for undetectable corruption
      } catch {
        case _: Exception => () // loud failure: also acceptable
      }
    }
  }

  test("unknown block codecs are rejected loudly") {
    val e = intercept[IllegalStateException](
      graft.sources.formats.CramFormat.decompress(9, Array[Byte](0), 1))
    assert(e.getMessage.contains("not supported"), e.getMessage)
  }
}
