package graft

import org.scalatest.funsuite.AnyFunSuite

/** Typed read API (ExonSession read_* parity). */
class GraftReadersSpec extends AnyFunSuite with SharedSpark {
  import GraftReaders._
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("readFasta / readVcf with region / readBigWigZoom / readInferred") {
    assert(spark.readFasta(s"$fx/fasta/test.fasta").count() == 2)
    assert(spark.readVcf(s"$fx/vcf/index.vcf.gz",
      Map("region" -> "1:9999919-10000000")).count() == 82)
    assert(spark.readBigWigZoom(s"$fx/bigwig/test.bw", reductionLevel = 400).count() > 0)
    assert(spark.readInferred(s"$fx/fastq/test.fastq").count() == 2)
    assert(spark.readBam(s"$fx/bam/test.bam").count() == 61)
    assert(spark.readCram(s"$fx/cram/1404_index_multislice.cram",
      Map("region" -> "CHROMOSOME_II")).count() == 10)
  }
}
