package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** fqzcomp (CRAM 3.1 block method 7) known-answer tests. The vectors in
  * fqz_vectors.txt were produced by tools/fqzcomp.py — an INDEPENDENT
  * encoder+decoder written from the public CRAMcodecs spec, not from the
  * Scala code — covering: the plain single-parameter path, per-record
  * varying lengths, a single 2000-byte record (multi-byte length), qmap
  * symbol remapping, ptab/dtab position and delta context tables (the
  * run-length array serialisation), a non-identity qtab, dedup records,
  * multi-parameter with selector contexts, an explicit selector table
  * (stab), and reversed records (DO_REV).
  */
class FqzSpec extends AnyFunSuite {
  private val vectors: Seq[(String, Int, Array[Byte], Array[Byte])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fqz_vectors.txt"), "US-ASCII")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, len, enc, data) = line.split(" ")
      (name, len.toInt,
        java.util.Base64.getDecoder.decode(enc),
        java.util.Base64.getDecoder.decode(data))
    }.toSeq
    finally src.close()
  }

  for ((name, len, enc, data) <- vectors) {
    test(s"fqzcomp decode: $name (${data.length} bytes)") {
      val got = graft.sources.formats.FqzComp.decode(enc, len)
      assert(got.sameElements(data), s"decode mismatch for $name")
      // the same stream through the CRAM block-codec entry point (method 7)
      val viaBlock = graft.sources.formats.CramFormat.decompress(7, enc, len)
      assert(viaBlock.sameElements(data))
    }
  }

  test("random single-byte corruption never hangs; failures are exceptions, not errors") {
    val rnd = new scala.util.Random(4321)
    for ((_, len, enc, _) <- vectors.take(5) if enc.length > 16; _ <- 0 until 40) {
      val b = enc.clone()
      val pos = 8 + rnd.nextInt(b.length - 8) // past vers/gflags/param head
      b(pos) = rnd.nextInt(256).toByte
      try {
        graft.sources.formats.FqzComp.decode(b, len)
        () // silent wrong output is acceptable for undetectable corruption
      } catch {
        case _: Exception => () // loud failure: also acceptable
      }
    }
  }

  test("wrong version byte fails loudly with a cram: message") {
    val e = intercept[IllegalArgumentException](
      graft.sources.formats.FqzComp.decode(Array[Byte](4, 0), 10))
    assert(e.getMessage.contains("fqzcomp version"), e.getMessage)
  }

  test("fqzcomp without an external size fails loudly") {
    val e = intercept[IllegalArgumentException](
      graft.sources.formats.FqzComp.decode(Array[Byte](5, 0), -1))
    assert(e.getMessage.contains("raw size"), e.getMessage)
  }
}
