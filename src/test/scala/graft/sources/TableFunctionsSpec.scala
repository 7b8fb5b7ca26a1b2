package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Literal SQL UDTF parity (exon_context_ext.rs:216-258 surface). */
class TableFunctionsSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("plain scans: fasta/gff/vcf/bam/mzml/sdf-style counts via SQL TVFs") {
    graft.GraftSession.registerAll(spark)
    def count(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(count(s"SELECT COUNT(*) FROM fasta_scan('$fx/fasta/test.fasta')") == 2)
    assert(count(s"SELECT COUNT(*) FROM fastq_scan('$fx/fastq/test.fastq')") == 2)
    assert(count(s"SELECT COUNT(*) FROM gff_scan('$fx/gff/test.gff')") == 5000)
    assert(count(s"SELECT COUNT(*) FROM gff_scan('$fx/gff-partition/')") == 10000)
    assert(count(s"SELECT COUNT(*) FROM vcf_scan('$fx/vcf/index.vcf')") == 621)
    assert(count(s"SELECT COUNT(*) FROM bam_scan('$fx/bam/test.bam')") == 61)
    assert(count(s"SELECT COUNT(*) FROM mzml_scan('$fx/mzml-pyoteomics/pyoteomics.mzML')") == 2)
    assert(count(s"SELECT COUNT(*) FROM bed_scan('$fx/bed/test.bed')") == 10)
    assert(count(s"SELECT COUNT(*) FROM hmm_dom_tab_scan('$fx/hmmdomtab/test.hmmdomtab')") == 100)
  }

  test("indexed scans: region argument prunes via the index") {
    graft.GraftSession.registerAll(spark)
    def count(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(count(
      s"SELECT COUNT(*) FROM gff_indexed_scan('$fx/gff-index/gencode.v38.polyAs.gff.gz', 'chr1')") == 8813)
    assert(count(
      s"SELECT COUNT(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz', '1:9999919-10000000')") == 82)
    assert(count(
      s"SELECT COUNT(*) FROM bam_indexed_scan('$fx/bam/test.bam', 'chr1:1-12209145')") == 7)
  }

  test("cram and bcf TVFs (beyond the reference surface)") {
    graft.GraftSession.registerAll(spark)
    def count(sql: String): Long = spark.sql(sql).head().getLong(0)
    val cram = s"$fx/cram/1404_index_multislice.cram"
    assert(count(s"SELECT COUNT(*) FROM cram_scan('$cram')") == 910)
    assert(count(
      s"SELECT COUNT(*) FROM cram_indexed_scan('$cram', 'CHROMOSOME_II')") == 10)
    assert(count(
      s"SELECT COUNT(*) FROM cram_indexed_scan('$cram', 'CHROMOSOME_I:200-210')") == 20)
    assert(count(
      s"SELECT COUNT(*) FROM bcf_indexed_scan('$fx/bcf/index.bcf', '1')") == 191)
  }

  test("fasta_indexed_scan: region string and region file") {
    graft.GraftSession.registerAll(spark)
    val r = spark.sql(
      s"SELECT * FROM fasta_indexed_scan('$fx/fasta-indexed/test.fasta', 'a:3-4')").head()
    assert(r.getString(0) == "a:3-4" && r.getString(2) == "CG")
    val rows = spark.sql(
      s"SELECT id, sequence FROM fasta_indexed_scan('$fx/fasta-indexed/test.fasta', " +
        s"'$fx/fasta-indexed/region.txt') ORDER BY id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a:1-2", "AT"), ("a:3-4", "CG")))
  }

  test("bare-chromosome region is never shadowed by a same-named local file") {
    graft.GraftSession.registerAll(spark)
    // A file named after the chromosome must not silently flip the region
    // argument into regionFile mode; coordinates force region semantics,
    // and a coordinate-less collision fails loud instead of guessing.
    val decoy = java.nio.file.Paths.get("1")
    java.nio.file.Files.write(decoy, "not a region file".getBytes)
    try {
      val n = spark.sql(
        s"SELECT COUNT(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz', '1:1-999999999')")
        .head().getLong(0)
      assert(n == 191)
      val e = intercept[Exception] {
        spark.sql(s"SELECT COUNT(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz', '1')")
          .head()
      }
      assert(e.getMessage.contains("ambiguous region argument"), e.getMessage)
    } finally java.nio.file.Files.deleteIfExists(decoy)
    // without the decoy the bare name is a plain region
    val n2 = spark.sql(
      s"SELECT COUNT(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz', '1')")
      .head().getLong(0)
    assert(n2 == 191)
    // path-like argument with no file behind it fails loud, not 0 rows
    val e2 = intercept[Exception] {
      spark.sql(
        s"SELECT COUNT(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz', './no_such_regions.txt')")
        .head()
    }
    assert(e2.getMessage.contains("region file not found"), e2.getMessage)
  }

  test("TVF composes with WHERE and projections") {
    graft.GraftSession.registerAll(spark)
    // the fixture holds 2513 sq0 + 2487 sq1 rows
    val n = spark.sql(
      s"SELECT COUNT(*) FROM gff_scan('$fx/gff/test.gff') WHERE seqname = 'sq0'")
      .head().getLong(0)
    assert(n == 2513)
  }

  test("scan TVF compression argument is honored (none excludes compressed files)") {
    graft.GraftSession.registerAll(spark)
    val fx = "/root/reference/exon/exon-core/test-data/datasources"
    val all = spark.sql(s"SELECT count(*) FROM fasta_scan('$fx/fa')").head().getLong(0)
    val none = spark.sql(s"SELECT count(*) FROM fasta_scan('$fx/fa', 'none')")
      .head().getLong(0)
    // the fa dir holds plain + gzip'd copies: 'none' must exclude the
    // compressed ones (4 records) where the default inferred scan reads all 8
    assert(none == 4 && all == 8, s"none=$none all=$all")
    // a null path argument must fail with a clear message, not scan 'null'
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM fasta_scan(CAST(NULL AS STRING))").collect()
    }
    assert(e.getMessage.contains("non-null"), e.getMessage)
  }
}
