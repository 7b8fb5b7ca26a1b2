package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** BAM reader goldens (bam-select-tests.slt / bam-indexed-select-tests.slt). */
class BamSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("bam: 61 records, golden first row matches the indexed slt golden") {
    val df = spark.read.format("bam").load(s"$fx/bam/test.bam")
    assert(df.count() == 61)
    val r = df.select("name", "flag", "reference", "start", "end",
      "mapping_quality", "cigar").head()
    assert(r.getString(0) == "READ_ID")
    assert(r.getInt(1) == 83)
    assert(r.getString(2) == "chr1")
    assert(r.getLong(3) == 12203704L)
    assert(r.getLong(4) == 12217173L)
    assert(r.isNullAt(5))
    assert(r.getString(6) == "55M13394N21M")
  }

  test("bam: hive-partitioned dir scans both samples") {
    val df = spark.read.format("bam").load(s"$fx/bam-partition")
    assert(df.count() == 122)
    assert(df.filter(col("sample") === "1").count() == 61)
  }

  test("bam: .bai region pushdown, overlap semantics (golden 7)") {
    val df = spark.read.format("bam")
      .option("region", "chr1:1-12209145").load(s"$fx/bam/test.bam")
    assert(df.count() == 7)
    // WHERE-path: bam_region_filter rewrite -> filters -> .bai chunks
    graft.GraftSession.registerAll(spark)
    spark.read.format("bam").load(s"$fx/bam/test.bam").createOrReplaceTempView("bam_t")
    val n = spark.sql(
      """SELECT COUNT(*) FROM bam_t
        |WHERE bam_region_filter('chr1:1-12209145', reference, start, `end`)""".stripMargin)
      .head().getLong(0)
    assert(n == 7)
    // partitioned dir + region = 14 across both samples
    val part = spark.read.format("bam")
      .option("region", "chr1:1-12209145").load(s"$fx/bam-partition")
    assert(part.count() == 14)
  }

  test("bam: sequence and quality decode") {
    val df = spark.read.format("bam").load(s"$fx/bam/test.bam")
    val r = df.select("sequence", "quality_score").head()
    assert(r.getString(0) != null && r.getString(0).forall("ACGTN=MRSVWYHKDB".contains(_)))
    // quality column may be null (0xff) or a list of small ints
    if (!r.isNullAt(1)) assert(r.getSeq[Long](1).forall(q => q >= 0 && q < 94))
  }
}
