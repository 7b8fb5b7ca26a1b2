package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** BCF binary reader goldens (reference inline tests: 621 total, chrom '1'
  * region -> 191; cross-checked against the VCF text reader on the same
  * variants).
  */
class BcfSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("bcf: 621 records; CSI-indexed region counts per chromosome") {
    val df = spark.read.format("bcf").load(s"$fx/bcf/index.bcf")
    assert(df.count() == 621)
    def reg(r: String) = spark.read.format("bcf").option("region", r)
      .load(s"$fx/bcf/index.bcf").count()
    assert(reg("1") == 191)
    assert(reg("2") == 219)
    assert(reg("10") == 211)
    assert(reg("chrZZ") == 0) // CSI proves absence without scanning
    assert(reg("1:9999919-10000000") == 82)
  }

  test("bcf decodes the same variants as the vcf text reader") {
    // index.vcf is the text form of the same callset.
    val bcf = spark.read.format("bcf").load(s"$fx/bcf/index.bcf")
      .select("chrom", "pos", "ref", "alt", "qual")
    val vcf = spark.read.format("vcf").load(s"$fx/vcf/index.vcf")
      .select("chrom", "pos", "ref", "alt", "qual")
    assert(bcf.count() == vcf.count())
    assert(bcf.exceptAll(vcf).count() == 0)
    assert(vcf.exceptAll(bcf).count() == 0)
  }

  test("bcf info strings carry the dictionary-resolved keys") {
    val r = spark.read.format("bcf").load(s"$fx/bcf/index.bcf")
      .select("info", "formats").head()
    assert(r.getString(0).contains("DP="))
    // this BCF encodes only PL in FORMAT for the first record (the text
    // VCF's PL values 0,3,26 round-trip exactly)
    assert(r.getString(1) == "PL\t0,3,26")
  }
}
