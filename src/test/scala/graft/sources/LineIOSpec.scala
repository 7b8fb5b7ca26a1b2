package graft.sources

import java.io.ByteArrayInputStream
import org.scalatest.funsuite.AnyFunSuite

class LineIOSpec extends AnyFunSuite {

  private def readAll(s: String, bufHint: Int = 1 << 16): Seq[(String, Long)] = {
    val r = new ByteLineReader(new ByteArrayInputStream(s.getBytes("UTF-8")), 0L)
    val out = Seq.newBuilder[(String, Long)]
    var l = r.readLine()
    while (l != null) { out += ((l, r.lastLineStart)); l = r.readLine() }
    out.result()
  }

  test("line endings: \\n, \\r\\n, missing final newline") {
    assert(readAll("a\nbb\nccc").map(_._1) == Seq("a", "bb", "ccc"))
    assert(readAll("a\r\nbb\r\n").map(_._1) == Seq("a", "bb"))
    assert(readAll("").isEmpty)
    assert(readAll("\n\n").map(_._1) == Seq("", ""))
  }

  test("byte offsets track line starts exactly") {
    val offs = readAll("ab\ncd\r\nefg").map(_._2)
    assert(offs == Seq(0L, 3L, 7L))
  }

  test("lines spanning buffer boundaries survive (tiny stream chunks)") {
    // stream that returns one byte at a time
    val data = ("x" * 100 + "\n" + "y" * 50 + "\r\n" + "z" * 10).getBytes
    val in = new java.io.InputStream {
      var i = 0
      override def read(): Int = if (i >= data.length) -1 else { val b = data(i); i += 1; b & 0xff }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= data.length) return -1
        b(off) = data(i); i += 1; 1
      }
    }
    val r = new ByteLineReader(in, 0L)
    assert(r.readLine() == "x" * 100)
    assert(r.readLine() == "y" * 50)
    assert(r.readLine() == "z" * 10)
    assert(r.readLine() == null)
  }

  test("reg2bins: standard tabix scheme invariants") {
    // whole-genome query touches every level's first bin
    val whole = TabixIndex.reg2bins(0, 1L << 29)
    assert(whole.contains(0) && whole.contains(1) && whole.contains(9) &&
      whole.contains(73) && whole.contains(585) && whole.contains(4681))
    // a point query yields exactly one bin per level (6 levels)
    assert(TabixIndex.reg2bins(100000, 100001).size == 6)
    // csi parameterization reduces to the same scheme at 14/5
    assert(TabixIndex.reg2bins(12345, 67890) ==
      TabixIndex.reg2bins(12345, 67890, minShift = 14, depth = 5))
  }

  test("codecs: extension classification and stripping") {
    assert(Codecs.isCompressed("x.vcf.gz") && Codecs.isCompressed("y.GFF.ZST"))
    assert(!Codecs.isCompressed("x.bam"))
    assert(Codecs.stripCompression("a.fasta.gz") == "a.fasta")
    assert(Codecs.stripCompression("a.fasta") == "a.fasta")
  }

  test("bzip2 and xz decompression by extension") {
    val dir = graft.TestTmp.dir("graft_codec")
    val fasta = ">a d1\nATCG\n>b d2\nGGCC\n"
    val bz = dir.resolve("t.fasta.bz2")
    val bzo = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
      java.nio.file.Files.newOutputStream(bz))
    bzo.write(fasta.getBytes("UTF-8")); bzo.close()
    val xz = dir.resolve("t.fasta.xz")
    val xzo = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(
      java.nio.file.Files.newOutputStream(xz))
    xzo.write(fasta.getBytes("UTF-8")); xzo.close()
    Seq(bz, xz).foreach { f =>
      assert(Codecs.isCompressed(f.getFileName.toString))
      assert(Codecs.stripCompression(f.getFileName.toString) == "t.fasta")
      val in = Codecs.wrap(f.getFileName.toString, java.nio.file.Files.newInputStream(f))
      val got = new String(in.readAllBytes(), "UTF-8")
      assert(got == fasta, s"$f roundtrip")
    }
  }
}
