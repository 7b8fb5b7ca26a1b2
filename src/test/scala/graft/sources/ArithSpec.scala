package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Adaptive-arithmetic (CRAM 3.1 block method 6) known-answer tests. The
  * vectors in arith_vectors.txt were produced by tools/arith.py — an
  * INDEPENDENT encoder+decoder written from the public CRAMcodecs spec,
  * not from the Scala code — covering order-0/1, CAT, EXT (bzip2), RLE
  * (inline adaptive run models incl. a 255-chain), PACK, PACK+RLE and
  * EXT+PACK composition, STRIPE, NOSZ, a full 256-symbol alphabet (the
  * max_sym=0 encoding), and degenerate 1-/2-byte inputs.
  */
class ArithSpec extends AnyFunSuite {
  private val NOSZ = 16

  private val vectors: Seq[(String, Int, Int, Array[Byte], Array[Byte])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/arith_vectors.txt"), "US-ASCII")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, flags, len, enc, data) = line.split(" ")
      (name, flags.toInt, len.toInt,
        java.util.Base64.getDecoder.decode(enc),
        java.util.Base64.getDecoder.decode(data))
    }.toSeq
    finally src.close()
  }

  test("vectors cover all arith flags") {
    val seen = vectors.map(_._2).reduce(_ | _)
    assert((seen & 0xFD) == 0xFD, f"flag coverage 0x$seen%02x")
    assert(vectors.size >= 18)
  }

  for ((name, flags, len, enc, data) <- vectors) {
    test(s"arith decode: $name (flags=$flags, ${data.length} bytes)") {
      val known = if ((flags & NOSZ) != 0) len else -1
      val got = graft.sources.formats.ArithDynamic.decode(enc, known)
      assert(got.sameElements(data), s"decode mismatch for $name")
      // the same stream through the CRAM block-codec entry point (method 6)
      val viaBlock = graft.sources.formats.CramFormat.decompress(6, enc, data.length)
      assert(viaBlock.sameElements(data))
    }
  }

  test("random single-byte corruption never hangs; failures are exceptions, not errors") {
    val rnd = new scala.util.Random(1234)
    for ((_, _, len, enc, _) <- vectors.take(6) if enc.length > 8; _ <- 0 until 40) {
      val b = enc.clone()
      // mutate past the flags/size header so the output size stays sane
      // (a corrupt ulen legitimately asks for a multi-GB buffer)
      val pos = 4 + rnd.nextInt(b.length - 4)
      b(pos) = rnd.nextInt(256).toByte
      try {
        graft.sources.formats.ArithDynamic.decode(b, len)
        () // silent wrong output is acceptable for undetectable corruption
      } catch {
        case _: Exception => () // loud failure: also acceptable
        // anything else (StackOverflow, OOM, infinite loop via test timeout)
        // fails the test
      }
    }
  }

  test("corrupt uint7 fails loudly with a cram: message") {
    // flags=0 then an over-long varint for ulen
    val bad = Array[Byte](0, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte)
    val e = intercept[IllegalStateException](
      graft.sources.formats.ArithDynamic.decode(bad, -1))
    assert(e.getMessage.contains("cram"), e.getMessage)
  }
}
