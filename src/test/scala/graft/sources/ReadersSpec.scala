package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Fixture-count and golden-row tests mirroring the reference slt corpus
  * (reference fixtures at /root/reference/exon/exon-core/test-data/datasources).
  */
class ReadersSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("fasta: single file, gzip, zstd, golden rows") {
    val df = spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
    assert(df.columns.toSeq == Seq("id", "description", "sequence"))
    assert(df.collect().toSeq == Seq(
      Row("a", "description", "ATCG"), Row("b", "description2", "ATCG")))
    assert(spark.read.format("fasta").load(s"$fx/fasta/test.fasta.gz").count() == 2)
    assert(spark.read.format("fasta").load(s"$fx/fasta/test.fasta.zst").count() == 2)
  }

  test("fasta: directory scan filters by extension (.fa dir of 2 files = 4)") {
    val df = spark.read.format("fasta").option("compression", "none").load(s"$fx/fa")
    assert(df.count() == 4)
  }

  test("fasta: SQL DDL CREATE TABLE USING fasta") {
    spark.sql("DROP TABLE IF EXISTS fasta_ddl")
    spark.sql(s"CREATE TABLE fasta_ddl USING fasta LOCATION '$fx/fasta/test.fasta'")
    assert(spark.sql("SELECT COUNT(*) FROM fasta_ddl").head().getLong(0) == 2)
    spark.sql("DROP TABLE fasta_ddl")
  }

  test("fastq: records, description split, gzip") {
    val df = spark.read.format("fastq").load(s"$fx/fastq/test.fastq")
    val rows = df.select("name", "description").collect().toSeq
    assert(rows == Seq(Row("SEQ_ID", "This is a description"), Row("SEQ_ID2", null)))
    assert(spark.read.format("fastq").load(s"$fx/fastq/test.fastq.gz").count() == 2)
    assert(spark.read.format("fastq").load(s"$fx/fastq/test.fq").count() == 2)
  }

  test("gff: golden first row, counts, gzip/zstd") {
    val df = spark.read.format("gff").load(s"$fx/gff/test.gff")
    assert(df.count() == 5000)
    val r = df.select("seqname", "source", "start", "end", "score", "strand", "phase").head()
    assert(r == Row("sq0", "caat", 8L, 13L, null, "+", null))
    // attributes map
    val attrs = df.select(element_at(col("attributes"), "gene_id")).head().getSeq[String](0)
    assert(attrs == Seq("caat1"))
    assert(spark.read.format("gff").load(s"$fx/gff/test.gff.gz").count() == 5000)
    assert(spark.read.format("gff").load(s"$fx/gff/test.gff.zst").count() == 5000)
  }

  test("gff: hive partitioned dir with pruning") {
    val df = spark.read.format("gff").load(s"$fx/gff-partition")
    assert(df.columns.contains("sample"))
    assert(df.count() == 10000)
    assert(df.filter(col("sample") === "1").count() == 5000)
    // partition filter must prune files, not just rows: explain shows pushed filters
    val scan = df.filter(col("sample") === "1").queryExecution.executedPlan.toString
    assert(scan.contains("GraftScan"), scan)
  }

  test("gtf: count and attributes") {
    val df = spark.read.format("gtf").load(s"$fx/gtf/test.gtf")
    assert(df.count() == 77)
    val r = df.select("seqname", "start", "end").head()
    assert(r == Row("chr1", 11869L, 12227L))
    val gid = df.select(element_at(col("attributes"), "gene_id")).head().getString(0)
    assert(gid == "ENSG00000223972")
  }

  test("bed: golden row with nulls beyond present columns") {
    val df = spark.read.format("bed").load(s"$fx/bed/test.bed")
    assert(df.count() == 10)
    val r = df.head()
    assert(r == Row("chr1", 11873L, 12227L, "NR_046018_exon_0_0_chr1_11874_f", 0L, "+",
      null, null, null, null, null, null))
    assert(spark.read.format("bed").load(s"$fx/bed/test3.bed").count() == 10)
    // n_fields option restricts the schema (reference table option)
    val df6 = spark.read.format("bed").option("nFields", "6").load(s"$fx/bed/test.bed")
    assert(df6.schema.fields.length == 6)
    assert(df6.columns.last == "strand")
    assert(df6.count() == 10)
  }

  test("hmmdomtab: 23 columns, count, gzip") {
    val df = spark.read.format("hmmdomtab").load(s"$fx/hmmdomtab/test.hmmdomtab")
    assert(df.count() == 100)
    assert(df.schema.fields.length == 23)
    assert(df.select("target_name").head().getString(0) == "KanNP_rdsDRAFT_30000008001")
    assert(spark.read.format("hmmdomtab").load(s"$fx/hmmdomtab/test.hmmdomtab.gz").count() == 100)
  }

  test("sam: golden record incl. computed end and quality list") {
    val df = spark.read.format("sam").load(s"$fx/sam/test.sam")
    val r = df.select("name", "flag", "reference", "start", "end", "mapping_quality",
      "cigar", "mate_reference").head()
    assert(r == Row("ref1_grp1_p001", 99, "ref1", 1L, 10L, "0", "10M", "ref1"))
    assert(df.select("sequence").head().getString(0) == "CGAGCTCGGT")
    assert(df.select("quality_score").head().getSeq[Long](0) == Seq.fill(10)(0L))
    val tags = df.select("tags").head().getSeq[Row](0)
    assert(tags.take(2) == Seq(Row("MD", "10"), Row("NM", "0")))
  }

  test("vcf: counts (incl. bgzip .gz), raw info/formats strings") {
    val df = spark.read.format("vcf").load(s"$fx/vcf/index.vcf")
    assert(df.count() == 621)
    assert(spark.read.format("vcf").load(s"$fx/vcf/index.vcf.gz").count() == 621)
    val r = df.select("info", "formats").head()
    assert(r.getString(0) == "DP=1;I16=1,0,0,0,26,676,0,0,60,3600,0,0,0,0,0,0;QS=1,0;MQ0F=0")
    assert(r.getString(1) == "GT:PL:PG\t0/0:0,3,26:0")
  }

  test("vcf: region filter function composes with the reader") {
    val df = spark.read.format("vcf").load(s"$fx/vcf/index.vcf")
    df.createOrReplaceTempView("vcf_t")
    graft.GraftSession.registerAll(spark)
    val n = spark.sql(
      "SELECT COUNT(*) FROM vcf_t WHERE vcf_region_filter('1:3000000-3100000', chrom, pos)")
      .head().getLong(0)
    val oracle = df.filter(col("chrom") === "1" && col("pos").between(3000000, 3100000)).count()
    assert(n == oracle)
  }

  test("column pruning reaches the parser (projection pushdown)") {
    val df = spark.read.format("gff").load(s"$fx/gff/test.gff").select("seqname")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GraftScan"))
    assert(df.distinct().count() >= 1)
  }

  test("splittable read: same rows regardless of split size") {
    // Force tiny splits so the 5000-row gff file is read as many mid-file
    // splits; results must be identical to the whole-file read.
    val whole = spark.read.format("gff").load(s"$fx/gff/test.gff")
      .agg(count(lit(1)), sum(col("start")), sum(col("end"))).head()
    withConf("spark.sql.files.maxPartitionBytes", "4096",
             "spark.sql.files.openCostInBytes", "0") {
      val split = spark.read.format("gff").load(s"$fx/gff/test.gff")
        .agg(count(lit(1)), sum(col("start")), sum(col("end"))).head()
      assert(split == whole)
    }
    // FASTA record alignment across splits
    val fWhole = spark.read.format("fasta").option("compression", "none")
      .load(s"$fx/fa").orderBy("id").collect().toSeq
    withConf("spark.sql.files.maxPartitionBytes", "16",
             "spark.sql.files.openCostInBytes", "0") {
      val fSplit = spark.read.format("fasta").option("compression", "none")
        .load(s"$fx/fa").orderBy("id").collect().toSeq
      assert(fSplit == fWhole)
    }
  }

  private def withConf(kvs: String*)(body: => Unit): Unit = {
    val pairs = kvs.grouped(2).map(a => (a(0), a(1))).toSeq
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
