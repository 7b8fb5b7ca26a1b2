package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row

/** fasta_indexed_scan goldens (fasta-indexed-scan-tests.slt). */
class FastaIndexedSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources/fasta-indexed"

  test("region extraction goldens") {
    val whole = spark.read.format("fasta").option("region", "a").load(s"$fx/test.fasta")
    assert(whole.collect().toSeq == Seq(Row("a", null, "ATCG")))
    val sub = spark.read.format("fasta").option("region", "a:3-4").load(s"$fx/test.fasta")
    assert(sub.collect().toSeq == Seq(Row("a:3-4", null, "CG")))
  }

  test("region file with multiple regions") {
    val df = spark.read.format("fasta").option("regionFile", s"$fx/region.txt")
      .load(s"$fx/test.fasta").orderBy("id")
    assert(df.collect().toSeq == Seq(
      Row("a:1-2", null, "AT"), Row("a:3-4", null, "CG")))
  }

  test("gzip input takes the streaming path") {
    val df = spark.read.format("fasta").option("region", "a:1-2").load(s"$fx/test.fasta.gz")
    assert(df.collect().toSeq == Seq(Row("a:1-2", null, "AT")))
  }

  // ---- .fai seek path ----

  /** 4 MB synthetic FASTA (2 sequences, 60-char lines, base i = "ACGT"((i-1)%4))
    * plus a generated .fai.
    */
  private lazy val bigFasta: org.apache.hadoop.fs.Path = {
    val dir = graft.TestTmp.dir("graft_fai").toString
    val f = new java.io.File(dir, "big.fasta")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f))
    Seq("chrA" -> 2000000, "chrB" -> 2000000).foreach { case (name, len) =>
      w.write(s">$name synthetic\n")
      var i = 0
      while (i < len) {
        val n = math.min(60, len - i)
        val sb = new StringBuilder(n)
        var j = 0
        while (j < n) { sb.append("ACGT".charAt((i + j) % 4)); j += 1 }
        w.write(sb.toString); w.write("\n")
        i += n
      }
    }
    w.close()
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    FaiIndex.write(fs, p)
    p
  }

  test(".fai seek: extraction matches the pattern and reads ~region bytes") {
    val fs = bigFasta.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val idx = FaiIndex.read(fs, bigFasta)
    assert(idx("chrA") == FaiEntry("chrA", 2000000, 16, 60, 61))
    // base i (1-based) = "ACGT"((i-1)%4); 1000001 -> (1000000)%4=0 -> 'A'
    val (sub, bytesRead) = FaiIndex.extract(fs, bigFasta, idx("chrB"), 1000001, 1000016)
    assert(sub == "ACGTACGTACGTACGT")
    assert(bytesRead <= 32, s"seek read $bytesRead bytes for a 16-base region")
    // spans a line boundary (line length 60)
    val (sub2, _) = FaiIndex.extract(fs, bigFasta, idx("chrA"), 59, 62)
    assert(sub2 == (59 to 62).map(i => "ACGT".charAt((i - 1) % 4)).mkString)
  }

  test(".fai seek: full scan through the DataFrame API returns the right rows") {
    val df = spark.read.format("fasta")
      .option("region", "chrB:1000001-1000016").load(bigFasta.toString)
    assert(df.collect().toSeq == Seq(Row("chrB:1000001-1000016", null, "ACGTACGTACGTACGT")))
    // clamped + whole-sequence region still works via the index
    val tail = spark.read.format("fasta")
      .option("region", "chrA:1999998-2999999").load(bigFasta.toString)
    val expected = (1999998 to 2000000).map(i => "ACGT".charAt((i - 1) % 4)).mkString
    assert(tail.collect().toSeq == Seq(Row("chrA:1999998-2999999", null, expected)))
  }
}
