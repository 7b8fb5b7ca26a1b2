package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-reader coverage over the reference's own test fixtures
  * (read-only at /root/reference/exon/exon-core/test-data/datasources).
  *
  * DuckDB cannot read these formats, so each oracle pins the expected result
  * as typed literals — golden rows from the reference slt corpus and
  * independently recomputed aggregates. The sfDir argument is ignored.
  */
object FormatQueries {
  type Q = (SparkSession, String) => DataFrame

  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  val queries: Map[String, Q] = Map(
    // fasta-scan-tests.slt / fasta-copy-tests.slt golden rows
    "f01_fasta_scan" -> ((s, _) =>
      s.read.format("fasta").load(s"$fx/fasta/test.fasta")
        .orderBy("id")),

    // compression variants + extension-filtered directory scan
    "f02_fasta_counts" -> ((s, _) => {
      val gz = s.read.format("fasta").load(s"$fx/fasta/test.fasta.gz")
        .agg(count(lit(1)).as("n_gz"))
      val zst = s.read.format("fasta").load(s"$fx/fasta/test.fasta.zst")
        .agg(count(lit(1)).as("n_zst"))
      val dir = s.read.format("fasta").option("compression", "none").load(s"$fx/fa")
        .agg(count(lit(1)).as("n_dir"))
      gz.crossJoin(zst).crossJoin(dir)
    }),

    // fastq-scan-test.slt golden rows
    "f03_fastq_scan" -> ((s, _) =>
      s.read.format("fastq").load(s"$fx/fastq/test.fastq")
        .select("name", "description", "sequence", "quality_scores")
        .orderBy("name")),

    "f04_gff_scan" -> ((s, _) =>
      s.read.format("gff").load(s"$fx/gff/test.gff")
        .agg(count(lit(1)).as("n"), sum(col("start")).as("sum_start"),
          sum(col("end")).as("sum_end"),
          countDistinct(col("type")).as("n_types"))),

    // hive-partitioned dir: per-sample counts (gff-scan-tests.slt:58-66)
    "f05_gff_partition" -> ((s, _) =>
      s.read.format("gff").load(s"$fx/gff-partition")
        .groupBy(col("sample")).agg(count(lit(1)).as("n"))
        .orderBy(col("sample"))),

    "f06_gtf_scan" -> ((s, _) =>
      s.read.format("gtf").load(s"$fx/gtf/test.gtf")
        .agg(count(lit(1)).as("n"), sum(col("start")).as("sum_start"),
          sum(col("end")).as("sum_end"))),

    // bed-select-tests.slt golden first row + aggregate
    "f07_bed_scan" -> ((s, _) =>
      s.read.format("bed").load(s"$fx/bed/test.bed")
        .agg(count(lit(1)).as("n"), sum(col("start")).as("sum_start"),
          sum(col("end")).as("sum_end"), count(col("name")).as("n_name"))),

    "f08_hmmdomtab_scan" -> ((s, _) =>
      s.read.format("hmmdomtab").load(s"$fx/hmmdomtab/test.hmmdomtab")
        .agg(count(lit(1)).as("n"), sum(col("tlen")).as("sum_tlen"),
          sum(col("qlen")).as("sum_qlen"),
          countDistinct(col("target_name")).as("n_targets"))),

    // sam-select-tests.slt golden record (computed end, quality decode)
    "f09_sam_scan" -> ((s, _) =>
      s.read.format("sam").load(s"$fx/sam/test.sam")
        .select(col("name"), col("flag"), col("reference"), col("start"), col("end"),
          col("mapping_quality"), col("cigar"), col("mate_reference"), col("sequence"),
          col("quality_score"))),

    "f10_vcf_scan" -> ((s, _) => {
      val plain = s.read.format("vcf").load(s"$fx/vcf/index.vcf")
        .agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"), countDistinct(col("chrom")).as("n_chrom"))
      val gz = s.read.format("vcf").load(s"$fx/vcf/index.vcf.gz")
        .agg(count(lit(1)).as("n_gz"))
      plain.crossJoin(gz)
    }),

    // write path round trip: fasta -> gzip'd fasta -> read back
    // (fasta-copy-tests.slt COPY ... STORED AS FASTA equivalent)
    "f12_fasta_roundtrip" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_fasta_rt").toString
      val src = s.read.format("fasta").load(s"$fx/fasta/test.fasta")
      src.write.format("fasta").mode("overwrite").option("compression", "gzip")
        .save(s"$dir/t")
      s.read.format("fasta").load(s"$dir/t").orderBy("id")
    }),

    // tabix-indexed GFF: region option -> BGZF chunk pruning + row filter;
    // counts independently recomputed from the raw fixture
    "f13_gff_indexed_region" -> ((s, _) => {
      val p = s"$fx/gff-index/gencode.v38.polyAs.gff.gz"
      val chr1 = s.read.format("gff").option("region", "chr1").load(p)
        .agg(count(lit(1)).as("n_chr1"))
      val chr2 = s.read.format("gff").option("region", "chr2").load(p)
        .agg(count(lit(1)).as("n_chr2"))
      val none = s.read.format("gff").option("region", "chrZZ").load(p)
        .agg(count(lit(1)).as("n_none"))
      val filt = s.read.format("gff").load(p)
        .filter(col("seqname") === "chr1")
        .agg(count(lit(1)).as("n_where"))
      chr1.crossJoin(chr2).crossJoin(none).crossJoin(filt)
    }),

    // tabix-indexed VCF: point-containment region semantics
    "f14_vcf_indexed_region" -> ((s, _) => {
      val p = s"$fx/vcf/index.vcf.gz"
      val narrow = s.read.format("vcf").option("region", "1:9999919-10000000").load(p)
        .agg(count(lit(1)).as("n_narrow"))
      val whole = s.read.format("vcf").option("region", "1").load(p)
        .agg(count(lit(1)).as("n_chr1"))
      narrow.crossJoin(whole)
    }),

    // region predicate over the VCF reader (containment semantics)
    "f11_vcf_region" -> ((s, _) => {
      graft.GraftSession.registerAll(s)
      val df = s.read.format("vcf").load(s"$fx/vcf/index.vcf")
      df.createOrReplaceTempView("f11_vcf")
      s.sql(
        """SELECT COUNT(*) AS n_region FROM f11_vcf
          |WHERE vcf_region_filter('1:9999919-10000000', chrom, pos)""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "f01_fasta_scan" ->
      """SELECT * FROM (VALUES
        |  ('a', 'description', 'ATCG'),
        |  ('b', 'description2', 'ATCG')) t(id, description, sequence)
        |ORDER BY id""".stripMargin,

    "f02_fasta_counts" ->
      "SELECT CAST(2 AS BIGINT) AS n_gz, CAST(2 AS BIGINT) AS n_zst, CAST(4 AS BIGINT) AS n_dir",

    "f03_fastq_scan" ->
      """SELECT * FROM (VALUES
        |  ('SEQ_ID', 'This is a description',
        |   'GATTTGGGGTExonAAGCAGTATCGAExonAATAGTAAATCCATTTGTExonACExonCAGTTT',
        |   '!''''*((((***+))%%%++)(%%%%).1***-+*''''))**55CCF>>>>>>CCCCCCC65'),
        |  ('SEQ_ID2', NULL,
        |   'GATTTGGGGTExonAAGCAGTATCGAExonAATAGTAAATCCATTTGTExonACExonCAGTTT',
        |   '!''''*((((***+))%%%++)(%%%%).1***-+*''''))**55CCF>>>>>>CCCCCCC65')
        |) t(name, description, sequence, quality_scores)
        |ORDER BY name""".stripMargin,

    "f04_gff_scan" ->
      """SELECT CAST(5000 AS BIGINT) AS n, CAST(40000 AS BIGINT) AS sum_start,
        |  CAST(67487 AS BIGINT) AS sum_end, CAST(1 AS BIGINT) AS n_types""".stripMargin,

    "f05_gff_partition" ->
      """SELECT * FROM (VALUES ('1', CAST(5000 AS BIGINT)), ('2', CAST(5000 AS BIGINT)))
        |t(sample, n) ORDER BY sample""".stripMargin,

    "f06_gtf_scan" ->
      """SELECT CAST(77 AS BIGINT) AS n, CAST(1391096 AS BIGINT) AS sum_start,
        |  CAST(1405631 AS BIGINT) AS sum_end""".stripMargin,

    "f07_bed_scan" ->
      """SELECT CAST(10 AS BIGINT) AS n, CAST(151130 AS BIGINT) AS sum_start,
        |  CAST(154101 AS BIGINT) AS sum_end, CAST(10 AS BIGINT) AS n_name""".stripMargin,

    "f08_hmmdomtab_scan" ->
      """SELECT CAST(100 AS BIGINT) AS n, CAST(3410 AS BIGINT) AS sum_tlen,
        |  CAST(21126 AS BIGINT) AS sum_qlen, CAST(99 AS BIGINT) AS n_targets""".stripMargin,

    "f09_sam_scan" ->
      """SELECT 'ref1_grp1_p001' AS name, 99 AS flag, 'ref1' AS reference,
        |  CAST(1 AS BIGINT) AS start, CAST(10 AS BIGINT) AS "end",
        |  '0' AS mapping_quality, '10M' AS cigar, 'ref1' AS mate_reference,
        |  'CGAGCTCGGT' AS sequence,
        |  CAST([0,0,0,0,0,0,0,0,0,0] AS BIGINT[]) AS quality_score""".stripMargin,

    "f10_vcf_scan" ->
      """SELECT CAST(621 AS BIGINT) AS n, CAST(2999980 AS BIGINT) AS min_pos,
        |  CAST(10000109 AS BIGINT) AS max_pos, CAST(3 AS BIGINT) AS n_chrom,
        |  CAST(621 AS BIGINT) AS n_gz""".stripMargin,

    "f11_vcf_region" ->
      "SELECT CAST(82 AS BIGINT) AS n_region",

    "f12_fasta_roundtrip" ->
      """SELECT * FROM (VALUES
        |  ('a', 'description', 'ATCG'),
        |  ('b', 'description2', 'ATCG')) t(id, description, sequence)
        |ORDER BY id""".stripMargin,

    "f13_gff_indexed_region" ->
      """SELECT CAST(8813 AS BIGINT) AS n_chr1, CAST(7223 AS BIGINT) AS n_chr2,
        |  CAST(0 AS BIGINT) AS n_none, CAST(8813 AS BIGINT) AS n_where""".stripMargin,

    "f14_vcf_indexed_region" ->
      "SELECT CAST(82 AS BIGINT) AS n_narrow, CAST(191 AS BIGINT) AS n_chr1"
  )
}
