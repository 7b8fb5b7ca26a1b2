package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Extension-inferred reads: format("graft").load(path). */
class AutoFormatSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("auto-detect by extension incl. compression suffixes") {
    assert(spark.read.format("graft").load(s"$fx/fasta/test.fasta").count() == 2)
    assert(spark.read.format("graft").load(s"$fx/fastq/test.fastq.gz").count() == 2)
    assert(spark.read.format("graft").load(s"$fx/gff/test.gff.zst").count() == 5000)
    assert(spark.read.format("graft").load(s"$fx/vcf/index.vcf.gz").count() == 621)
    assert(spark.read.format("graft").load(s"$fx/bam/test.bam").count() == 61)
  }

  test("unknown extension errors with the known list") {
    val e = intercept[Exception](
      spark.read.format("graft").load("/tmp/nope.xyz").schema)
    assert(e.toString.contains("xyz"))
  }
}
