package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** tok3 (CRAM 3.1 name tokeniser) known-answer tests. Vectors in
  * tok3_vectors.txt come from tools/tok3.py — an independent Python
  * encoder+decoder written from the public CRAMcodecs spec — over
  * realistic name corpora: Illumina coordinate names (DELTA/MATCH-heavy),
  * SRR accessions, PacBio movie names, zero-padded DIGITS0 names,
  * exact-duplicate runs (N_DUP), newline-separated region strings, a
  * single name, and the reference fixture's own r000..r004 read names.
  * The `*_impl` vectors use the implicit-separator convention (the
  * terminator is not a token; the decoder re-appends it at N_END, as
  * htscodecs does) — the decoder must accept both conventions.
  */
class Tok3Spec extends AnyFunSuite {
  private val vectors: Seq[(String, Array[Byte], Array[Byte])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/tok3_vectors.txt"), "US-ASCII")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, enc, data) = line.split(" ")
      (name, java.util.Base64.getDecoder.decode(enc),
        java.util.Base64.getDecoder.decode(data))
    }.toSeq
    finally src.close()
  }

  for ((name, enc, data) <- vectors) {
    test(s"tok3 decode: $name (${data.length} bytes)") {
      val got = graft.sources.formats.Tok3.decode(enc)
      assert(got.sameElements(data), s"decode mismatch for $name")
      // the same stream through the CRAM block-codec entry point (method 8)
      val viaBlock = graft.sources.formats.CramFormat.decompress(8, enc, data.length)
      assert(viaBlock.sameElements(data))
    }
  }

  test("an unknown tok3 flags byte is rejected loudly") {
    // minimal header claiming flags=2 (neither rANS Nx16 nor arith)
    val hdr = Array[Byte](4, 0, 0, 0, 1, 0, 0, 0, 2)
    val e = intercept[IllegalArgumentException](
      graft.sources.formats.Tok3.decode(hdr))
    assert(e.getMessage.contains("flags byte"), e.getMessage)
  }
}
