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
}
