package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Fixed per-gate scratch dir, reused across runs: repeated Verify/driver
    * gate runs must not accumulate one fresh temp dir per run in /tmp.
    * Writers run with mode=overwrite into the same dir; generated corpora
    * are guarded by a `_done` marker and built once.
    */
  private def gateDir(name: String): java.io.File = {
    val d = new java.io.File(
      sys.props.get("java.io.tmpdir").getOrElse("/tmp"), s"graft_gate_$name")
    d.mkdirs()
    d
  }

  /** Shared corpus + checks for the f71/f72 FASTQ split gates: 200k records
    * through the engine's own FASTQ sink as ONE shard (plus a BGZF copy
    * with no index for the resync arm), then a split-forced read that
    * refuses to grade a one-task plan. Every third record's quality line
    * starts with '@' BY CONSTRUCTION — the exact ambiguity the chained
    * record validation must reject — and n_at_qual proves the parser
    * routed headers vs quality lines correctly under the split.
    */
  private def fastqSplitGate(s: SparkSession, bgzf: Boolean): DataFrame = {
    val dir = gateDir("fastq_split")
    val fq = new java.io.File(dir, "reads.fastq")
    val gz = new java.io.File(dir, "reads.fastq.gz")
    if (!new java.io.File(dir, "_done").exists()) {
      val n = 200000L
      s.range(0, n).select(
          concat(lit("r"), col("id")).as("name"),
          when(col("id") % 5 === 0, concat(lit("d"), col("id")))
            .otherwise(lit(null).cast("string")).as("description"),
          translate(substring(concat(md5(col("id").cast("string")),
              md5((col("id") + n).cast("string")),
              md5((col("id") + 2 * n).cast("string"))), 1, 80),
            "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
          concat(when(col("id") % 3 === 0, lit("@")).otherwise(lit("E")),
            substring(translate(substring(concat(
                md5((col("id") + 3 * n).cast("string")),
                md5((col("id") + 4 * n).cast("string")),
                md5((col("id") + 5 * n).cast("string"))), 1, 80),
              "0123456789abcdef", "!#$%&'()*+,-./:;"), 2, 79))
            .as("quality_scores"))
        .repartition(1)
        .write.format("fastq").mode("overwrite")
        .save(new java.io.File(dir, "sink").getAbsolutePath)
      // single shard -> single file; move it to a stable name
      val part = new java.io.File(dir, "sink").listFiles()
        .filter(_.getName.endsWith(".fastq")).head
      java.nio.file.Files.deleteIfExists(fq.toPath)
      java.nio.file.Files.move(part.toPath, fq.toPath)
      // BGZF copy, no index sibling: the resync-split landing shape
      val fos = new java.io.FileOutputStream(gz)
      val w = new graft.sources.BgzfWriter(
        new java.io.BufferedOutputStream(fos, 1 << 16))
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(fq), 1 << 16)
      try {
        val buf = new Array[Byte](1 << 16)
        var r = in.read(buf)
        while (r > 0) { w.write(buf, 0, r); r = in.read(buf) }
        w.finish()
      } finally { in.close(); fos.close() }
      new java.io.File(dir, "_done").createNewFile()
    }
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.files.maxPartitionBytes", "2097152")
      s.conf.set("spark.sql.files.openCostInBytes", "16384")
      val df = s.read.format("fastq")
        .load(if (bgzf) gz.getAbsolutePath else fq.getAbsolutePath)
      val parts = df.rdd.getNumPartitions
      require(parts >= 4,
        s"fastq ${if (bgzf) "bgzf resync" else "validated"} split did not " +
          s"engage: $parts partition(s)")
      val rows = df.agg(
        count(lit(1)).as("n"),
        sum(when(col("quality_scores").startsWith("@"), 1L).otherwise(0L))
          .as("n_at_qual"),
        sum(expr("CAST(substring(name, 2) AS BIGINT)")).as("sum_name_id"),
        sum(length(col("sequence"))).cast("long").as("sum_seq_len")).collect()
      import s.implicits._
      rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toDF("n", "n_at_qual", "sum_name_id", "sum_seq_len")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
    }
  }

  /** Shared f70/f74 gate: one big UNINDEXED CRAM (no .crai) must fan out
    * index-free and aggregate exactly. `sweep = false` grades the default
    * task-open-resync planner path (O(1) driver planning); `sweep = true`
    * flips `graft.cram.resyncSplit.enabled` off to grade the legacy
    * driver-side header-skipping sweep on the SAME corpus — both arms must
    * match the same oracle. Conf overrides (SQL and hadoop) save/restore.
    */
  private def cramIndexFreeGate(s: SparkSession, sweep: Boolean): DataFrame = {
    val dir = gateDir("cram_aligned")
    val cramDir = new java.io.File(dir, "t")
    if (!new java.io.File(dir, "_done").exists()) {
      s.range(0, 120000L).select(
          concat(lit("r"), col("id")).as("name"),
          lit(0).as("flag"),
          concat(lit("chr"), (col("id") % 2 + 1).cast("string")).as("reference"),
          ((col("id") / 2).cast("long") * 100 + 1).as("start"),
          ((col("id") / 2).cast("long") * 100 + 100).as("end"),
          lit("30").as("mapping_quality"),
          lit("100M").as("cigar"),
          lit(null).cast("string").as("mate_reference"),
          translate(substring(concat(md5(col("id").cast("string")),
              md5((col("id") + 120000L).cast("string")),
              md5((col("id") + 240000L).cast("string")),
              md5((col("id") + 360000L).cast("string"))), 1, 100),
            "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
          array_repeat(lit(30L), 100).as("quality_score"),
          array().cast("array<struct<tag:string,value:string>>").as("tags"))
        .repartitionByRange(1, col("reference"), col("start"))
        .sortWithinPartitions("reference", "start")
        .write.format("cram").mode("overwrite")
        .option("refs", "chr1:40000000,chr2:40000000")
        .save(cramDir.getAbsolutePath)
      // delete the sink's .crai: the gate is about the NO-index shape
      cramDir.listFiles().foreach { f =>
        if (f.getName.endsWith(".crai")) require(f.delete())
      }
      new java.io.File(dir, "_done").createNewFile()
    }
    val keys = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    val hc = s.sparkContext.hadoopConfiguration
    val hcKey = "graft.cram.resyncSplit.enabled"
    val hcSaved = Option(hc.get(hcKey))
    try {
      if (sweep) hc.set(hcKey, "false")
      s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
      s.conf.set("spark.sql.files.openCostInBytes", "16384")
      val df = s.read.format("cram").load(cramDir.getAbsolutePath)
        .select("reference", "start")
      val parts = df.rdd.getNumPartitions
      require(parts >= 3,
        s"index-free CRAM ${if (sweep) "sweep" else "resync"} split did " +
          s"not engage: $parts partition(s)")
      val rows = df.groupBy(col("reference"))
        .agg(count(lit(1)).as("n"), sum(col("start")).cast("long").as("sum_start"))
        .orderBy("reference").collect()
      import s.implicits._
      rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toDF("reference", "n", "sum_start")
    } finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
      hcSaved match { case Some(x) => hc.set(hcKey, x); case None => hc.unset(hcKey) }
    }
  }

  val queries: Map[String, Q] = Map(
    // Assembly stats (the `seqkit stats` shape): contig count, total/max
    // length, N50 and N90 — computed over sequences that ROUND-TRIP
    // through the engine's own FASTA sink and reader (documents text,
    // spaces stripped), so the sink, the reader, and the stats are all on
    // the gate at once. N50 is exact via histogram collapse: lengths
    // group to (length, count) first, and the desc-cumulative window runs
    // over DISTINCT lengths only (l24's discipline) — a billion-contig
    // assembly costs one keyed groupBy plus a window over the tiny
    // histogram, never a sort of the contig list.
    "f51_assembly_stats" -> ((s, d) => {
      val dir = gateDir("assembly_stats").getAbsolutePath
      Tables.documents(s, d)
        .select(col("doc_id").cast("string").as("id"),
          lit(null).cast("string").as("description"),
          regexp_replace(col("text"), " ", "").as("sequence"))
        .write.format("fasta").mode("overwrite").save(s"$dir/t")
      val lens = s.read.format("fasta").load(s"$dir/t")
        .select(length(col("sequence")).cast("long").as("l"))
      val tot = lens.agg(count(lit(1)).as("n_contigs"),
        sum(col("l")).as("total_len"), max(col("l")).as("max_len"))
      val w = Window.orderBy(col("l").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = lens.groupBy(col("l")).agg(count(lit(1)).as("c"))
        .withColumn("cw", sum(col("l") * col("c")).over(w))
      val n50 = cum.crossJoin(broadcast(tot))
        .filter(col("cw") * 2 >= col("total_len"))
        .agg(max(col("l")).as("n50"))
      val n90 = cum.crossJoin(broadcast(tot))
        .filter(col("cw") * 10 >= col("total_len") * 9)
        .agg(max(col("l")).as("n90"))
      tot.crossJoin(broadcast(n50)).crossJoin(broadcast(n90))
    }),

    // BigWig SINK round trip on driver data: an hourly event-count track
    // (chrom = event_type, 100 units per hour) written as real bbi —
    // header, chrom B+ tree, zlib bedGraph sections, R-tree — then read
    // back through the independent BbiFile reader path and gate-compared
    // against DuckDB computing the same track relationally. The write is
    // range-partitioned by chromosome so each `.bw` shard owns whole
    // chroms — the layout that keeps zoom bins shard-local at scale.
    "f52_bigwig_write_roundtrip" -> ((s, d) => {
      val dir = gateDir("bigwig_rt").getAbsolutePath
      bigwigTrack(s, d).write.format("bigwig_value")
        .option("zoomLevels", "1000").mode("overwrite").save(s"$dir/t")
      s.read.format("bigwig_value").load(s"$dir/t")
        .orderBy("name", "start")
    }),

    // Zoom levels COMPUTED BY THE SINK (not copied from any input): the
    // writer aggregates the track into 1000-unit bins per the Kent spec
    // (validCount = covered bases, per-base weighted sums, ends clipped
    // to the chrom extent), and DuckDB re-derives the identical summary
    // from raw events — so the zoom math itself is on the oracle gate.
    // All values are integer-valued, so float32 zoom storage is exact.
    "f53_bigwig_write_zoom" -> ((s, d) => {
      val dir = gateDir("bigwig_zoom_w").getAbsolutePath
      bigwigTrack(s, d).write.format("bigwig_value")
        .option("zoomLevels", "1000").mode("overwrite").save(s"$dir/t")
      s.read.format("bigwig_zoom").option("reductionLevel", "1000")
        .load(s"$dir/t").orderBy("name", "start")
    }),

    // Indexed BigWig region reads: the `.option("region", ...)` path now
    // descends only overlapping R-tree subtrees (BigWigRegionSpec proves
    // non-overlapping blocks are never inflated); golden sub-regions of
    // the reference's test.bw fixture.
    "f54_bigwig_indexed_region" -> ((s, _) => {
      val a = s.read.format("bigwig_value").option("region", "1:101-150")
        .load(s"$fx/bigwig/test.bw")
      val b = s.read.format("bigwig_value").option("region", "10:250-260")
        .load(s"$fx/bigwig/test.bw")
      a.unionByName(b).orderBy("name", "start")
    }),

    // `samtools flagstat` twin over the BAM fixture, computed with the
    // engine's native bitwise flag predicates (one codegen'd aggregate
    // pass, no UDFs). Oracle pinned by tools/pin_f55.py, which re-parses
    // the BAM with Python gzip + struct — independent of this reader.
    "f55_bam_flagstat" -> ((s, _) => {
      graft.GraftSession.registerAll(s)
      def n(pred: String) =
        sum(when(expr(pred), 1L).otherwise(0L))
      s.read.format("bam").load(s"$fx/bam/test.bam")
        .agg(count(lit(1)).as("total"),
          n("not is_unmapped(flag)").as("mapped"),
          n("is_segmented(flag)").as("paired"),
          n("is_properly_aligned(flag)").as("proper_pair"),
          n("is_reverse_complemented(flag)").as("reverse"),
          n("is_first_segment(flag)").as("first_seg"),
          n("is_last_segment(flag)").as("last_seg"),
          n("is_secondary(flag)").as("secondary"),
          n("is_qc_fail(flag)").as("qc_fail"),
          n("is_duplicate(flag)").as("dup"),
          n("is_supplementary(flag)").as("supplementary"))
    }),

    // `bcftools stats` twin: allele-class counts (SNP / transition /
    // transversion / indel, multiallelic sites) over the VCF fixture in
    // two codegen'd aggregate passes (record-level + exploded
    // allele-level, combined as 1-row broadcasts). Oracle verified
    // against an independent Python text parse of the same vcf.gz.
    "f56_vcf_stats" -> ((s, _) => {
      val v = s.read.format("vcf").load(s"$fx/vcf/index.vcf.gz")
      val recs = v.agg(count(lit(1)).as("n_records"),
        sum(when(size(col("alt")) > 1, 1L).otherwise(0L)).as("n_multiallelic"))
      val al = v.select(col("ref"), explode(col("alt")).as("a"))
        .withColumn("is_snp", length(col("ref")) === 1 &&
          length(col("a")) === 1 && col("a").isin("A", "C", "G", "T"))
        .withColumn("is_ts",
          concat(col("ref"), col("a")).isin("AG", "GA", "CT", "TC"))
      val types = al.agg(
        sum(when(col("is_snp"), 1L).otherwise(0L)).as("n_snp"),
        sum(when(col("is_snp") && col("is_ts"), 1L).otherwise(0L)).as("n_ts"),
        sum(when(col("is_snp") && !col("is_ts"), 1L).otherwise(0L)).as("n_tv"),
        sum(when(length(col("ref")) =!= length(col("a")), 1L).otherwise(0L))
          .as("n_indel"))
      recs.crossJoin(broadcast(types))
    }),

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
          array_join(col("quality_score"), ",").as("quality_score"))),

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
      val dir = gateDir("fasta_rt").getAbsolutePath
      val src = s.read.format("fasta").load(s"$fx/fasta/test.fasta")
      src.write.format("fasta").mode("overwrite").option("compression", "gzip")
        .save(s"$dir/t")
      s.read.format("fasta").load(s"$dir/t").orderBy("id")
    }),

    // FASTQ writer round trip (fastq-copy-tests.slt COPY ... STORED AS FASTQ
    // equivalent): fastq -> gzip'd fastq -> read back
    "f29_fastq_roundtrip" -> ((s, _) => {
      val dir = gateDir("fastq_rt").getAbsolutePath
      val src = s.read.format("fastq").load(s"$fx/fastq/test.fastq")
      src.write.format("fastq").mode("overwrite").option("compression", "gzip")
        .save(s"$dir/t")
      s.read.format("fastq").load(s"$dir/t")
        .select("name", "description", "sequence", "quality_scores")
        .orderBy("name")
    }),

    // Literal SQL table functions end-to-end (exon_context_ext.rs:216-258):
    // plain scans, indexed scans with region pushdown, via spark.sql only.
    "f30_sql_table_functions" -> ((s, _) => {
      graft.GraftSession.registerAll(s)
      s.sql(
        s"""SELECT
           |  (SELECT count(*) FROM fasta_scan('$fx/fasta/test.fasta')) AS n_fasta,
           |  (SELECT count(*) FROM fastq_scan('$fx/fastq/test.fastq')) AS n_fastq,
           |  (SELECT count(*) FROM bam_scan('$fx/bam/test.bam')) AS n_bam,
           |  (SELECT count(*) FROM vcf_indexed_scan('$fx/vcf/index.vcf.gz',
           |     '1:9999919-10000000')) AS n_vcf_region,
           |  (SELECT count(*) FROM gff_indexed_scan(
           |     '$fx/gff-index/gencode.v38.polyAs.gff.gz', 'chr1')) AS n_gff_region,
           |  (SELECT max(pos) FROM bcf_scan('$fx/bcf/index.bcf')) AS max_bcf_pos,
           |  (SELECT count(*) FROM fasta_indexed_scan('$fx/fasta/test.fasta',
           |     'a:1-2')) AS n_fasta_region,
           |  (SELECT count(*) FROM bigwig_value_scan('$fx/bigwig/test.bw'))
           |     AS n_bw,
           |  (SELECT count(*) FROM bigwig_value_indexed_scan(
           |     '$fx/bigwig/test.bw', '1:101-150')) AS n_bw_region,
           |  (SELECT count(*) FROM bigwig_zoom_scan('$fx/bigwig/test.bw',
           |     400)) AS n_bw_zoom""".stripMargin)
    }),

    // .fai-seek region extraction over a 4 MB synthetic reference: base i of
    // each sequence is "ACGT"((i-1)%4), so expected subsequences are
    // derivable in the oracle without reading the file. The .fai index makes
    // each region a byte-range seek, not a file scan (FastaIndexedSpec
    // asserts bytes-read ~ region size).
    "f31_fasta_fai_seek" -> ((s, _) => {
      val dir = gateDir("fai_gate").getAbsolutePath
      val f = new java.io.File(dir, "ref.fasta")
      val rf = new java.io.File(dir, "regions.txt")
      if (!new java.io.File(dir, "_done").exists()) {
        val w = new java.io.BufferedWriter(new java.io.FileWriter(f))
        Seq("chrA", "chrB").foreach { name =>
          w.write(s">$name\n")
          var i = 0
          while (i < 2000000) {
            val n = math.min(60, 2000000 - i)
            val sb = new StringBuilder(n)
            var j = 0
            while (j < n) { sb.append("ACGT".charAt((i + j) % 4)); j += 1 }
            w.write(sb.toString); w.write("\n")
            i += n
          }
        }
        w.close()
        val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
        graft.sources.FaiIndex.write(
          p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
        java.nio.file.Files.writeString(rf.toPath,
          "chrB:1000001-1000016\nchrA:59-62\nchrA:1999997-2000000\n")
        new java.io.File(dir, "_done").createNewFile()
      }
      s.read.format("fasta")
        .option("regionFile", rf.getAbsolutePath)
        .load(f.getAbsolutePath)
        .orderBy("id")
    }),

    // Indexed-sink round trip: a generated variant table written through
    // the DSv2 VCF sink with bgzf compression (per-part .tbi siblings),
    // read back both fully and through a region option (tabix chunk
    // seeks on the sink's own output). Counts are arithmetic, so the
    // oracle derives them from generate_series without reading files.
    "f35_vcf_write_indexed" -> ((s, _) => {
      val dir = gateDir("vcf_sink").getAbsolutePath
      val out = s"$dir/t"
      val n = 10000L
      val df = s.range(0, 4 * n)
        .select(
          concat(lit("chr"), (col("id") / n).cast("long").cast("string")).as("chrom"),
          ((col("id") % n) * 150 + 1).as("pos"),
          lit(null).cast("array<string>").as("id"),
          lit("A").as("ref"),
          array(lit("G")).as("alt"),
          (col("id") % 60).cast("float").as("qual"),
          array(lit("PASS")).as("filter"),
          concat(lit("AC="), (col("id") % 7).cast("string")).as("info"),
          lit(null).cast("string").as("formats"))
        .repartitionByRange(4, col("chrom"), col("pos"))
        .sortWithinPartitions("chrom", "pos")
      df.write.format("vcf").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val full = s.read.format("vcf").load(out)
        .agg(count(lit(1)).as("n_full"), sum(col("pos")).as("sum_pos"))
      val reg = s.read.format("vcf").option("region", "chr2:300000-330000")
        .load(out)
        .agg(count(lit(1)).as("n_region"), sum(col("qual")).cast("long").as("sum_qual"))
      full.crossJoin(reg)
    }),

    // GFF through the indexed sink: the reference annotation fixture
    // re-written as sharded bgzf+.tbi by the engine itself, then read
    // back fully and through a region option — counts pinned from the
    // htslib-produced original (f13's constants).
    "f36_gff_write_indexed" -> ((s, _) => {
      val dir = gateDir("gff_sink").getAbsolutePath
      val out = s"$dir/t"
      // repartitionByRange SAMPLES its input to pick bounds, and a plain-
      // gzip GFF is unsplittable — without a cut the whole file inflates
      // and parses twice (sampling job + shuffle job). localCheckpoint
      // pays one in-memory copy of the 96k rows instead.
      s.read.format("gff").load(s"$fx/gff-index/gencode.v38.polyAs.gff.gz")
        .localCheckpoint()
        .repartitionByRange(4, col("seqname"), col("start"))
        .sortWithinPartitions("seqname", "start")
        .write.format("gff").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val full = s.read.format("gff").load(out)
        .agg(count(lit(1)).as("n_all"),
          countDistinct(col("seqname")).as("n_chroms"))
      val reg = s.read.format("gff").option("region", "chr1")
        .load(out).agg(count(lit(1)).as("n_chr1"))
      full.crossJoin(reg)
    }),

    // count(*) answered from .fai metadata alone (SupportsPushDownAggregates):
    // an 8-file FASTA directory with per-file .fai siblings; the gate itself
    // refuses to grade unless the plan chose GraftCountScan, so a silent
    // fallback to a data scan fails loudly rather than passing on the value.
    // Shape matches the reference's count-shaped benchmark queries
    // (exon-benchmarks/src/main.rs:241).
    "f37_fasta_count_pushdown" -> ((s, _) => {
      val dir = gateDir("count_gate")
      val done = new java.io.File(dir, "_done")
      if (!done.exists()) {
        val conf = s.sparkContext.hadoopConfiguration
        (0 until 8).foreach { i =>
          val f = new java.io.File(dir, f"part$i%02d.fasta")
          val w = new java.io.BufferedWriter(new java.io.FileWriter(f))
          (0 until 100 + i).foreach { j =>
            w.write(s">f${i}_s$j\n")
            val len = 40 + (i * 31 + j) % 53
            val sb = new StringBuilder(len)
            (0 until len).foreach(k => sb.append("ACGT".charAt((i + j + k) % 4)))
            w.write(sb.toString); w.write("\n")
          }
          w.close()
          val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
          graft.sources.FaiIndex.write(p.getFileSystem(conf), p)
        }
        done.createNewFile()
      }
      val agg = s.read.format("fasta").load(dir.getAbsolutePath)
        .groupBy().count()
      val plan = agg.queryExecution.executedPlan.toString
      require(plan.contains("GraftCountScan"),
        s"count(*) was not answered from .fai metadata:\n$plan")
      agg.select(col("count").as("n"))
    }),

    // BAM count(*) from .bai metadata pseudo-bins (bin 37450 mapped/unmapped
    // counts + trailing n_no_coor — the `samtools idxstats` numbers): like
    // f37, the gate refuses to grade unless the plan chose GraftCountScan,
    // and the metadata answer must match the full-scan fixture count (f19).
    "f39_bam_count_pushdown" -> ((s, _) => {
      val agg = s.read.format("bam").load(s"$fx/bam/test.bam")
        .groupBy().count()
      val plan = agg.queryExecution.executedPlan.toString
      require(plan.contains("GraftCountScan"),
        s"count(*) was not answered from .bai metadata:\n$plan")
      agg.select(col("count").as("n"))
    }),

    // BAM through the indexed sink (beyond reference — its COPY is
    // text-only): the htslib-produced fixture re-written as sharded
    // bgzf BAM + per-part .bai by the engine itself, then (a) read back
    // with zero row-level diff vs the original, (b) region-queried
    // through its own .bai, and (c) count(*)-answered from its own
    // .bai metadata pseudo-bins — the gate refuses to grade unless the
    // plan chose GraftCountScan.
    "f40_bam_write_indexed" -> ((s, _) => {
      val dir = gateDir("bam_sink").getAbsolutePath
      val out = s"$dir/t"
      s.read.format("bam").load(s"$fx/bam/test.bam")
        .repartitionByRange(2, col("reference"), col("start"))
        .sortWithinPartitions(col("reference").asc_nulls_last,
          col("start").asc_nulls_last)
        .write.format("bam").mode("overwrite")
        .option("headerFrom", s"$fx/bam/test.bam").save(out)
      val back = s.read.format("bam").load(out)
      val orig = s.read.format("bam").load(s"$fx/bam/test.bam")
      val full = back.agg(count(lit(1)).as("n_full"))
      val diff = back.exceptAll(orig).agg(count(lit(1)).as("n_diff"))
      val reg = s.read.format("bam").option("region", "chr1:1-12209145")
        .load(out).agg(count(lit(1)).as("n_region"))
      val meta = s.read.format("bam").load(out).groupBy().count()
      val plan = meta.queryExecution.executedPlan.toString
      require(plan.contains("GraftCountScan"),
        s"count(*) was not answered from the sink's own .bai metadata:\n$plan")
      full.crossJoin(diff).crossJoin(reg)
        .crossJoin(meta.select(col("count").as("n_meta")))
    }),

    // CRAM 3.0 no_ref sink round trip: the BAM fixture written as
    // reference-less CRAM (RR=false, bases verbatim in feature series) must
    // read back through the fixture-proven CRAM reader with zero row diffs
    // and reconstruct every base without a reference FASTA.
    "f41_cram_write_roundtrip" -> ((s, _) => {
      val dir = gateDir("cram_sink").getAbsolutePath
      val out = s"$dir/t"
      s.read.format("bam").load(s"$fx/bam/test.bam")
        .repartition(2)
        .write.format("cram").mode("overwrite")
        .option("headerFrom", s"$fx/bam/test.bam").save(out)
      val back = s.read.format("cram").load(out)
      val orig = s.read.format("bam").load(s"$fx/bam/test.bam")
      val full = back.agg(count(lit(1)).as("n_full"),
        sum(length(col("sequence"))).as("sum_seq"))
      val diff = back.exceptAll(orig).agg(count(lit(1)).as("n_diff"))
      full.crossJoin(diff)
    }),

    // Multi-sink interop CHAIN: fixture BAM → engine BAM sink → read →
    // engine CRAM sink → read — every hop through a different binary
    // writer/reader pair, with the final alignment-field sums pinned by
    // the independent Python gzip+struct parse of the ORIGINAL fixture
    // (tools/pin_f55.py's parser), so a loss anywhere in the chain breaks
    // the gate.
    // BED `nFields` table option (reference: bed/table_options.rs 3..=12,
    // exon-bed/src/schema.rs:27-49): the same 12-column file read at
    // nFields=4 must expose exactly the first 4 columns (schema truncation,
    // not null-padding), while the default read keeps all 12.
    "f59_bed_nfields" -> ((s, _) => {
      val dir = gateDir("bed_nfields")
      val f = new java.io.File(dir, "t.bed")
      if (!f.exists()) {
        val w = new java.io.BufferedWriter(new java.io.FileWriter(f))
        (0 until 100).foreach { i =>
          w.write(s"chr${i % 4}\t${i * 10}\t${i * 10 + 5}\tfeat$i\t${i % 50}\t+" +
            s"\t${i * 10}\t${i * 10 + 5}\t0\t1\t5\t0\n")
        }
        w.close()
      }
      val n4 = s.read.format("bed").option("nFields", "4")
        .load(f.getAbsolutePath)
      val full = s.read.format("bed").load(f.getAbsolutePath)
      n4.agg(
        count(lit(1)).as("n"),
        lit(n4.schema.fields.length.toLong).as("n_cols_4"),
        lit(full.schema.fields.length.toLong).as("n_cols_12"),
        sum(col("end") - col("start")).as("sum_span"))
        .crossJoin(broadcast(
          full.agg(sum(col("score")).as("sum_score"))))
    }),

    // zstd decode through the driver gate (f33 covers bzip2+xz; sbt specs
    // cover gzip/zstd): the same synthetic FASTA written raw and as .zst
    // must produce identical aggregates through extension-driven decode.
    "f60_zstd_scan" -> ((s, _) => {
      val dir = gateDir("zstd_scan")
      val raw = new java.io.File(dir, "t.fasta")
      val zst = new java.io.File(dir, "t.fasta.zst")
      if (!zst.exists()) {
        val body = (0 until 500)
          .map(i => s">z$i\n${"ACGT" * (1 + i % 9)}\n").mkString
        java.nio.file.Files.writeString(raw.toPath, body)
        val out = new com.github.luben.zstd.ZstdOutputStream(
          new java.io.FileOutputStream(zst))
        out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
      val a = s.read.format("fasta").load(raw.getAbsolutePath)
        .agg(count(lit(1)).as("n_raw"),
          sum(length(col("sequence"))).as("len_raw"))
      val b = s.read.format("fasta").load(zst.getAbsolutePath)
        .agg(count(lit(1)).as("n_zst"),
          sum(length(col("sequence"))).as("len_zst"))
      a.crossJoin(broadcast(b))
    }),

    // Object-store region query through the driver gate (previously
    // sbt+bench only): a bgzf+.tbi VCF table written by the engine's own
    // indexed sink is served by an in-process MiniS3 with SigV4 auth; the
    // full scan and the .tbi-pruned region read both run over
    // `s3://` (signed ranged GETs). EAGER like q70/q71 — the aggregates
    // materialize inside the gate so the server can stop before returning.
    "f61_s3_region" -> ((s, _) => {
      val dir = gateDir("s3_region")
      val tbl = new java.io.File(dir, "t")
      if (!new java.io.File(dir, "_done").exists()) {
        val n = 2000L
        s.range(0, 4 * n).select(
            concat(lit("chr"), (col("id") / n).cast("long").cast("string")).as("chrom"),
            ((col("id") % n) * 150 + 1).as("pos"),
            lit(null).cast("array<string>").as("id"),
            lit("A").as("ref"), array(lit("G")).as("alt"),
            (col("id") % 60).cast("float").as("qual"),
            array(lit("PASS")).as("filter"), lit("AC=1").as("info"),
            lit(null).cast("string").as("formats"))
          .repartitionByRange(4, col("chrom"), col("pos"))
          .sortWithinPartitions("chrom", "pos")
          .write.format("vcf").mode("overwrite")
          .option("compression", "bgzf").save(tbl.getAbsolutePath)
        new java.io.File(dir, "_done").createNewFile()
      }
      val mini = new graft.tools.MiniS3()
        .withAuth("graft-gate-access", "graft-gate-secret").start()
      val hc = s.sparkContext.hadoopConfiguration
      // the fs.s3.* keys are GLOBAL (hadoopConfiguration) and other
      // consumers (the bench's b09 MiniS3) may have configured them —
      // snapshot and restore so this gate cannot clobber a sibling's
      // endpoint/credentials
      val keys = Seq("fs.s3.impl", "fs.s3.endpoint", "fs.s3.impl.disable.cache",
        "fs.s3.access.key", "fs.s3.secret.key")
      val saved = keys.map(k => k -> Option(hc.get(k)))
      try {
        tbl.listFiles().filter(_.isFile).foreach { f =>
          mini.put("graft-gate", s"t/${f.getName}",
            java.nio.file.Files.readAllBytes(f.toPath))
        }
        hc.set("fs.s3.impl", classOf[graft.sources.s3.S3HttpFileSystem].getName)
        hc.set("fs.s3.endpoint", mini.endpoint)
        hc.set("fs.s3.impl.disable.cache", "true")
        hc.set("fs.s3.access.key", "graft-gate-access")
        hc.set("fs.s3.secret.key", "graft-gate-secret")
        val nFull = s.read.format("vcf").load("s3://graft-gate/t").count()
        val reg = s.read.format("vcf").option("region", "chr2:150001-300001")
          .load("s3://graft-gate/t")
          .agg(count(lit(1)), sum(col("qual")).cast("long")).collect().head
        import s.implicits._
        Seq((nFull, reg.getLong(0), reg.getLong(1)))
          .toDF("n_full", "n_region", "sum_qual")
      } finally {
        mini.stop()
        saved.foreach { case (k, v) =>
          v match { case Some(x) => hc.set(k, x); case None => hc.unset(k) }
        }
      }
    }),

    // CRAM 3.1 codec surface through the driver gate (previously CramSpec
    // only): the htslib-produced 3.0 fixture and its 3.1 recompressions
    // (v31: tok3 + rANS Nx16 all transform modes; v31a: arith tok3 +
    // fqzcomp + adaptive-arith all modes — tools/recompress_cram.py) must
    // produce IDENTICAL row-level aggregates. Fixture paths are the
    // repo-committed test resources, read directly.
    "f62_cram31_scan" -> ((s, _) => {
      // repo-committed fixtures, located relative to the working tree (env
      // override for non-root CWDs) instead of a hardcoded checkout path
      val root = sys.env.getOrElse("GRAFT_REPO_ROOT",
        new java.io.File(".").getCanonicalPath)
      val rdir = s"$root/src/test/resources/cram"
      require(new java.io.File(rdir).isDirectory,
        s"f62: CRAM 3.1 fixtures not found at $rdir " +
          "(run from the repo root or set GRAFT_REPO_ROOT)")
      def agg(p: String, suffix: String) =
        s.read.format("cram").load(p).agg(
          count(lit(1)).as(s"n_$suffix"),
          sum(col("flag")).as(s"flag_$suffix"),
          sum(col("start")).as(s"start_$suffix"),
          sum(length(col("sequence"))).as(s"seq_$suffix"))
      agg(s"$fx/cram/test_input_1_a.cram", "30")
        .crossJoin(broadcast(agg(s"$rdir/test_input_1_a_v31.cram", "31")))
        .crossJoin(broadcast(agg(s"$rdir/test_input_1_a_v31a.cram", "31a")))
    }),

    // Zero-code deployment path through the driver gate: a FRESH isolated
    // session (own Function/TableFunction registries) gains every graft
    // function purely through the `spark.sql.extensions=graft.GraftExtensions`
    // injection (run exactly as Spark runs it at session build — the
    // static conf itself cannot be redone in a live JVM). Refuses to grade
    // if the fresh session already had the functions (vacuous otherwise).
    "f63_extensions_sql" -> ((s, _) => {
      val ns = s.newSession()
      val pre =
        try { ns.sql("SELECT reverse_complement('ATCG')").collect(); true }
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      require(!pre, "f63: fresh session already had graft functions")
      val ext = new org.apache.spark.sql.SparkSessionExtensions
      new graft.GraftExtensions().apply(ext)
      org.apache.spark.sql.graftexpr.ExtensionsHook.runCheckRuleBuilders(ext, ns)
      val rc = ns.sql("SELECT reverse_complement('ATCG') AS rc").head().getString(0)
      val un = ns.sql("SELECT is_unmapped(4) AS u").head().getBoolean(0)
      val n = ns.sql(s"SELECT count(*) FROM fasta_scan('$fx/fasta/test.fasta')")
        .head().getLong(0)
      import s.implicits._
      Seq((rc, un, n)).toDF("rc", "unmapped", "n_fasta")
    }),

    // Loud-failure safety properties through the driver gate: silent
    // corruption paths must REFUSE, not produce wrong data. (a) the
    // indexed sink rejects unsorted rows (a broken ordering would emit a
    // silently-wrong .tbi); (b) a CRAM with an unsupported version is
    // rejected by version, not decoded as garbage; (c) a CRAM with broken
    // magic is rejected. Each arm must throw with the documented message.
    "f64_safety_refusals" -> ((s, _) => {
      // message text may sit anywhere in the Spark task-failure cause chain
      def chainMessages(e: Throwable): String = {
        val sb = new StringBuilder
        var t: Throwable = e
        while (t != null) { sb.append(String.valueOf(t.getMessage)).append('\n'); t = t.getCause }
        sb.toString
      }
      val dir = gateDir("safety")
      // (a) unsorted indexed write refused
      val unsortedRefused =
        try {
          s.range(0, 100).select(
              lit("chr1").as("chrom"), (lit(1000L) - col("id") * 7).as("pos"),
              lit(null).cast("array<string>").as("id"), lit("A").as("ref"),
              array(lit("G")).as("alt"), lit(50f).as("qual"),
              array(lit("PASS")).as("filter"), lit("AC=1").as("info"),
              lit(null).cast("string").as("formats"))
            .coalesce(1)
            .write.format("vcf").mode("overwrite")
            .option("compression", "bgzf").save(s"$dir/unsorted")
          false
        } catch {
          case e: Exception =>
            val m = chainMessages(e)
            m.contains("requires rows sorted by (chrom, pos)")
        }
      // (b) unsupported CRAM version refused by version check
      val src = java.nio.file.Paths
        .get(s"$fx/cram/test_input_1_a.cram")
      def mutated(name: String)(f: Array[Byte] => Unit): String = {
        val bytes = java.nio.file.Files.readAllBytes(src)
        f(bytes)
        val p = new java.io.File(dir, name).toPath
        java.nio.file.Files.write(p, bytes)
        p.toString
      }
      val v32 = mutated("v32.cram") { b => b(4) = 3; b(5) = 2 }
      val versionRefused =
        try { s.read.format("cram").load(v32).collect(); false }
        catch { case e: Exception =>
          chainMessages(e).contains("unsupported CRAM version 3.2")
        }
      // (c) broken magic refused
      val bad = mutated("bad.cram") { b => b(0) = 'X'.toByte }
      val magicRefused =
        try { s.read.format("cram").load(bad).collect(); false }
        catch { case _: Exception => true }
      import s.implicits._
      Seq((unsortedRefused, versionRefused, magicRefused))
        .toDF("unsorted_refused", "version_refused", "magic_refused")
    }),

    // Full-scan BGZF split: ONE sorted single-shard BAM (with .bai) must
    // fan out over multiple record-aligned chunk partitions with NO region
    // predicate — the round-11 scale fix for the "300 GB production BAM
    // decodes on one core" shape. Aggregates are computed EAGERLY under the
    // split-forcing conf (save/restore) so the graded values come from the
    // chunked read, and the gate refuses to grade an unsplit plan — the
    // golden constants would pass on a one-task scan too, but the gate
    // exists to prove the fan-out.
    "f65_bgzf_fullscan_split" -> ((s, _) => {
      val dir = gateDir("bgzf_split")
      val tbl = new java.io.File(dir, "t")
      if (!new java.io.File(dir, "_done").exists()) {
        val refs = (0 until 4).map(i => s"chr$i:40000000").mkString(",")
        s.range(0, 200000L).select(
            concat(lit("r"), col("id")).as("name"),
            (col("id") % 2).cast("int").as("flag"),
            concat(lit("chr"), (col("id") % 4).cast("string")).as("reference"),
            ((col("id") / 4).cast("long") * 150 + 1).as("start"),
            ((col("id") / 4).cast("long") * 150 + 100).as("end"),
            lit("30").as("mapping_quality"),
            lit("100M").as("cigar"),
            lit(null).cast("string").as("mate_reference"),
            rpad(lit(""), 100, "ACGT").as("sequence"),
            array_repeat(lit(30L), 100).as("quality_score"),
            array().cast("array<struct<tag:string,value:string>>").as("tags"))
          .repartitionByRange(1, col("reference"), col("start"))
          .sortWithinPartitions("reference", "start")
          .write.format("bam").mode("overwrite")
          .option("refs", refs).save(tbl.getAbsolutePath)
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "262144")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("bam").load(tbl.getAbsolutePath)
          .select("name", "flag", "reference", "start")
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"full-scan BGZF split did not engage: $parts partition(s)")
        val r = df.agg(count(lit(1)).as("n"),
          sum(col("flag")).cast("long").as("sum_flag"),
          sum(col("start")).cast("long").as("sum_start"),
          count(when(col("reference") === "chr2", 1)).as("n_chr2"))
          .collect().head
        import s.implicits._
        Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toDF("n", "sum_flag", "sum_start", "n_chr2")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // BCF sink (beyond-reference surface): spec-derived BCF2.2 encoder +
    // .csi writer. Deterministic rows go through write -> read-back, and
    // the graded aggregates (incl. a .csi-pruned region count) must match
    // the closed-form oracle; refuses to grade if the sink produced no
    // .csi sibling.
    "f66_bcf_sink" -> ((s, _) => {
      val dir = gateDir("bcf_sink")
      val header = new java.io.File(dir, "header.vcf")
      if (!header.exists()) {
        java.nio.file.Files.writeString(header.toPath,
          """##fileformat=VCFv4.3
            |##contig=<ID=chrA,length=100000000>
            |##contig=<ID=chrB,length=100000000>
            |##FILTER=<ID=PASS,Description="ok">
            |##FILTER=<ID=q10,Description="low">
            |##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">
            |##INFO=<ID=DB,Number=0,Type=Flag,Description="db">
            |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="depth">
            |##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="quality">
            |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	s1
            |""".stripMargin)
      }
      val out = new java.io.File(dir, "t")
      if (!new java.io.File(dir, "_done").exists()) {
        s.range(0, 10000).select(
            when(col("id") % 2 === 0, "chrA").otherwise("chrB").as("chrom"),
            ((col("id") / 2).cast("long") * 37 + 11).as("pos"),
            lit(null).cast("array<string>").as("id"),
            lit("A").as("ref"),
            array(lit("T")).as("alt"),
            (col("id") % 50).cast("float").as("qual"),
            when(col("id") % 4 === 0, array(lit("q10"))).otherwise(array(lit("PASS")))
              .as("filter"),
            concat(lit("DP="), (col("id") % 100).cast("string"),
              when(col("id") % 6 === 0, ";DB").otherwise(lit(""))).as("info"),
            concat(lit("DP:GQ\t"), (col("id") % 90).cast("string"), lit(":"),
              (col("id") % 60).cast("string")).as("formats"))
          .repartitionByRange(2, col("chrom"), col("pos"))
          .sortWithinPartitions("chrom", "pos")
          .write.format("bcf").mode("overwrite")
          .option("headerFrom", header.getAbsolutePath).save(out.getAbsolutePath)
        new java.io.File(dir, "_done").createNewFile()
      }
      require(out.listFiles().exists(_.getName.endsWith(".csi")),
        "f66: bcf sink produced no .csi sibling")
      val back = s.read.format("bcf").load(out.getAbsolutePath)
      val reg = s.read.format("bcf").option("region", "chrB:1000-50000")
        .load(out.getAbsolutePath).count()
      back.agg(count(lit(1)).as("n"),
        sum(col("pos")).cast("long").as("sum_pos"),
        count(when(array_contains(col("filter"), "q10"), 1)).as("n_q10"),
        count(when(col("info").endsWith(";DB"), 1)).as("n_db"))
        .withColumn("n_region", lit(reg))
    }),

    // Bgzipped indexed FASTA (the `samtools faidx ref.fa.gz` layout,
    // engine-written end to end): the FASTA sink's bgzf mode commits
    // .fa.gz + .fai (uncompressed-domain) + .gzi (block map) siblings;
    // the gate then (a) extracts two region subsequences by SEEKING the
    // compressed file through fai+gzi, (b) full-scans it split into
    // record-aligned chunks derived from the same indexes ('>'-validated
    // cuts; refuses to grade an unsplit plan), and (c) answers count(*)
    // from .fai metadata (refuses to grade unless GraftCountScan planned).
    "f68_fasta_bgzf_indexed" -> ((s, _) => {
      val dir = gateDir("fasta_bgzf")
      val tbl = new java.io.File(dir, "t")
      if (!new java.io.File(dir, "_done").exists()) {
        val pattern = "ACGTG" * 42 // 210 bases, every sequence a prefix
        s.range(0, 9600).select(
            concat(lit("seq"), format_string("%04d", col("id"))).as("id"),
            lit(null).cast("string").as("description"),
            substring(lit(pattern), lit(1),
              (lit(200) + col("id") % 7).cast("int")).as("sequence"))
          .coalesce(1).sortWithinPartitions("id")
          .write.format("fasta").mode("overwrite")
          .option("compression", "bgzf").save(tbl.getAbsolutePath)
        new java.io.File(dir, "_done").createNewFile()
      }
      require(tbl.listFiles().exists(_.getName.endsWith(".gzi")),
        "f68: bgzf fasta sink produced no .gzi sibling")
      val gz = tbl.listFiles().filter(_.getName.endsWith(".fasta.gz"))
        .head.getAbsolutePath
      val sub1 = s.read.format("fasta")
        .option("region", "seq0777:7-36").load(gz)
        .select("sequence").head.getString(0)
      val sub2 = s.read.format("fasta")
        .option("region", "seq0003").load(gz)
        .select("sequence").head.getString(0)
      val counted = s.read.format("fasta").load(tbl.getAbsolutePath)
        .groupBy().count()
      require(counted.queryExecution.executedPlan.toString
          .contains("GraftCountScan"),
        "f68: count(*) did not choose the .fai metadata path")
      val n = counted.head.getLong(0)
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        s.conf.set("spark.sql.files.openCostInBytes", "2048")
        val df = s.read.format("fasta").load(tbl.getAbsolutePath)
          .select("id", "sequence")
        val parts = df.rdd.getNumPartitions
        require(parts >= 3,
          s"f68: fai+gzi full-scan split did not engage: $parts partition(s)")
        val sumLen = df.agg(sum(length(col("sequence"))).cast("long"))
          .head.getLong(0)
        import s.implicits._
        Seq((n, sumLen, sub1, sub2))
          .toDF("n", "sum_len", "sub1", "sub2")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // Index-FREE BGZF split: a bgzipped VCF with NO .tbi sibling — the
    // common landing-zone shape — must still fan out over parallel chunks
    // (validated block-boundary scan + Hadoop line alignment at block
    // granularity; round-11's complement to f65's index-derived split).
    // Aggregates computed EAGERLY under the split-forcing conf
    // (save/restore); the gate refuses to grade an unsplit plan.
    // Index-free record-resync split: a big UNINDEXED BAM (no .bai — the
    // landing-zone shape before `samtools index`) must fan out over
    // parallel chunk partitions, the reader re-finding record boundaries
    // by validated header-chain scan (hadoop-bam SplitGuesser technique;
    // BamFormat.resyncRecords). Refuses to grade on a one-task plan.
    // Validated FASTQ record split, uncompressed arm: a big single-shard
    // .fastq must fan out over parallel chunks, mid chunks aligning by the
    // chained 4-line validation (quality lines legally start with '@' —
    // FastqFormat.validateWindow rejects them because the next line is a
    // '@' header, not a sequence). Refuses to grade a one-task plan.
    // Quality first char is '@' on every third record BY CONSTRUCTION, so
    // n_at_qual checks the parser routed header vs quality correctly.
    "f71_fastq_split" -> ((s, _) => fastqSplitGate(s, bgzf = false)),

    // The same corpus and checks over a BGZF copy with no index sibling
    // (bgzipped .fastq.gz): parallelism comes from the record-resync split
    // (BgzfResyncInputStream + validated alignment).
    "f72_fastq_bgzf_split" -> ((s, _) => fastqSplitGate(s, bgzf = true)),

    // Index-free CRAM container split: a big UNINDEXED CRAM (no .crai —
    // the landing-zone shape) must fan out. Since round 13 the default
    // planner path is the TASK-OPEN RESYNC split (O(1) driver planning;
    // GraftScan.containerResyncSplitChunks + CramFormat.
    // resyncContainerStart); f74 grades the conf-gated driver-sweep
    // fallback on the same corpus. Refuses to grade on a one-task plan.
    "f70_cram_aligned_split" -> ((s, _) => cramIndexFreeGate(s, sweep = false)),

    // The legacy driver-side header-skipping sweep (CramFormat.
    // alignedCutOffsets via graft.cram.resyncSplit.enabled=false), kept as
    // the escape hatch — must stay row-identical to f70's resync plan.
    "f74_cram_sweep_split" -> ((s, _) => cramIndexFreeGate(s, sweep = true)),

    // Record-aligned splits of a big uncompressed GenBank flat file (the
    // multi-GB release landing shape, one task before r13): column-0
    // LOCUS lines are unambiguous record starts, a record belongs to the
    // chunk owning its LOCUS line's first byte, and multi-line qualifiers
    // spanning a cut stay with their owner. Aggregates exercise the full
    // nested parse (sequence + features.qualifiers) so nested-pruning
    // ordinal bugs are also on this gate. Refuses an unsplit plan.
    "f75_genbank_split" -> ((s, _) => {
      val dir = gateDir("genbank_split")
      val f = new java.io.File(dir, "release.gb")
      if (!new java.io.File(dir, "_done").exists()) {
        val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
        val bases = "acgt" * 32
        (0 until 20000).foreach { k =>
          val n = 100 + (k % 7) * 10
          w.write(f"LOCUS       SEQ$k%d             $n%d bp    DNA     linear   CON 24-APR-2019\n")
          w.write(f"ACCESSION   A$k%06d\n")
          w.write("FEATURES             Location/Qualifiers\n")
          w.write(s"     gene            1..$n\n")
          w.write(s"""                     /locus_tag="LT$k"\n""")
          w.write("ORIGIN\n")
          var off = 0
          while (off < n) {
            val take = math.min(60, n - off)
            w.write(f"${off + 1}%9d ${bases.substring(0, take)}\n")
            off += take
          }
          w.write("//\n")
        }
        w.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("genbank").load(f.getAbsolutePath)
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"genbank record split did not engage: $parts partition(s)")
        val r = df.agg(
          count(lit(1)).as("n"),
          sum(length(col("sequence"))).cast("long").as("sum_seq_len"),
          sum(when(col("features")(0)("qualifiers")(0)("values")
            === concat(lit("LT"), regexp_extract(col("name"), "SEQ(\\d+)", 1)), 1L)
            .otherwise(0L)).as("n_tagged")).head
        import s.implicits._
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("n", "sum_seq_len", "n_tagged")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // Record-aligned splits of a big uncompressed SDF ($$$$-delimited
    // molecule records — the PubChem-dump landing shape, one task before
    // r13): a record belongs to the chunk owning its first byte, with the
    // exact-cut-at-record-start case disambiguated by the format's
    // positioned-read lookback (SdfSplitSpec sweeps every critical
    // in-record cut offset deterministically). Refuses an unsplit plan.
    "f76_sdf_split" -> ((s, _) => {
      val dir = gateDir("sdf_split")
      val f = new java.io.File(dir, "mols.sdf")
      if (!new java.io.File(dir, "_done").exists()) {
        val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
        (0 until 30000).foreach { k =>
          w.write(f"MOL$k%05d\n  SYNTH\ncomment\n")
          w.write("  2  1  0  0  0  0  0  0  0  0999 V2000\n")
          w.write("    0.0000    0.0000    0.0000 C\n")
          w.write("    1.0000    0.0000    0.0000 O\n")
          w.write("  1  2  1  0\nM  END\n> <id>\n")
          w.write(f"$k%05d\n\n")
          w.write("$$$$\n")
        }
        w.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("sdf").load(f.getAbsolutePath)
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"sdf record split did not engage: $parts partition(s)")
        val r = df.agg(
          count(lit(1)).as("n"),
          sum(col("atom_count")).cast("long").as("sum_atoms"),
          sum(col("data")("id").cast("long")).as("sum_id")).head
        import s.implicits._
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("n", "sum_atoms", "sum_id")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // Fixed-stride FCS split (the million-event cytometry landing shape,
    // one task before r13): the header/TEXT segment is the index — $TOT
    // rows of 4*$PAR bytes from dataStart — so cut offsets are exact and
    // row-aligned from one driver read; each chunk decodes exactly the
    // events whose start byte it owns. Values are integral floats, so
    // the long-cast sums compare exactly against the closed form.
    // Refuses an unsplit plan.
    "f77_fcs_split" -> ((s, _) => {
      val dir = gateDir("fcs_split")
      val f = new java.io.File(dir, "big.fcs")
      val nEv = 400000
      if (!new java.io.File(dir, "_done").exists()) {
        val text = "/$PAR/6/$TOT/" + nEv + "/$DATATYPE/F/$BYTEORD/1,2,3,4" +
          "/$P1S/FSC-A/$P2S/SSC-A/$P3S/FL1-A/$P4S/FL2-A/$P5S/FL3-A/$P6S/TIME/"
        val textStart = 58
        val textEnd = textStart + text.length - 1
        val dataStart = textStart + text.length
        val dataEnd = dataStart + nEv.toLong * 24 - 1
        val header =
          f"FCS3.0    $textStart%8d$textEnd%8d$dataStart%8d$dataEnd%8d${0}%8d${0}%8d"
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 20))
        out.writeBytes(header)
        out.writeBytes(text)
        var i = 0
        while (i < nEv) {
          var p = 0
          while (p < 6) {
            val v = ((i * 7 + p * 3) % 16381).toFloat
            out.writeInt(Integer.reverseBytes(java.lang.Float.floatToIntBits(v)))
            p += 1
          }
          i += 1
        }
        out.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("fcs").load(f.getAbsolutePath)
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"fcs fixed-stride split did not engage: $parts partition(s)")
        val r = df.agg(
          count(lit(1)).as("n"),
          sum(col("FSC-A").cast("long")).as("sum_fsc"),
          sum(col("TIME").cast("long")).as("sum_time")).head
        import s.implicits._
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("n", "sum_fsc", "sum_time")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // Raw-cut resync split of a big uncompressed mzML (the GB-scale
    // proteomics landing shape, one task before r13): tasks align to the
    // next <spectrum start tag they own and parse each element's bytes as
    // its own document (XML forbids unescaped '<' in text/attr values).
    // Aggregates force full base64+zlib decode of both arrays on every
    // chunk; intensities are integral doubles so the long sum is exact.
    // Refuses an unsplit plan.
    "f78_mzml_split" -> ((s, _) => {
      val dir = gateDir("mzml_split")
      val f = new java.io.File(dir, "big.mzML")
      val nSpec = 8000
      if (!new java.io.File(dir, "_done").exists()) {
        val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
        def b64zlib(vals: Array[Double]): String = {
          val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          vals.foreach(bb.putDouble)
          val defl = new java.util.zip.Deflater()
          defl.setInput(bb.array()); defl.finish()
          val out = new java.io.ByteArrayOutputStream(vals.length * 8)
          val buf = new Array[Byte](8192)
          while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
          defl.end()
          java.util.Base64.getEncoder.encodeToString(out.toByteArray)
        }
        w.write("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<mzML><run><spectrumList>\n")
        (0 until nSpec).foreach { i =>
          val n = 50
          val mz = Array.tabulate(n)(j => 100.0 + i % 7 + j * 9.97)
          val inten = Array.tabulate(n)(j => ((i * 31 + j * 17) % 10000).toDouble)
          w.write(s"""<spectrum id="scan=$i" index="$i" defaultArrayLength="$n">""")
          w.write("""<binaryDataArrayList count="2">""")
          w.write("""<binaryDataArray><cvParam accession="MS:1000514" name="m/z array"/>""" +
            """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
            """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
            s"<binary>${b64zlib(mz)}</binary></binaryDataArray>")
          w.write("""<binaryDataArray><cvParam accession="MS:1000515" name="intensity array"/>""" +
            """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
            """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
            s"<binary>${b64zlib(inten)}</binary></binaryDataArray>")
          w.write("</binaryDataArrayList></spectrum>\n")
        }
        w.write("</spectrumList></run></mzML>\n")
        w.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("mzml").load(f.getAbsolutePath)
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"mzml resync split did not engage: $parts partition(s)")
        val r = df.agg(
          count(lit(1)).as("n"),
          sum(size(col("mz.mz"))).cast("long").as("sum_n_mz"),
          sum(expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)"))
            .cast("long").as("sum_inten")).head
        import s.implicits._
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("n", "sum_n_mz", "sum_inten")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    // Index-free split OVER AN OBJECT STORE, driver-graded (previously
    // S3ResyncSweepSpec/sbt only): ONE unindexed bgzipped VCF — the
    // 300 GB-landing-zone shape — served by an in-process MiniS3 with
    // SigV4 auth, scanned over `s3://` where parallelism comes purely from
    // the index-free BGZF block split riding signed ranged GETs. Refuses
    // to grade an unsplit plan; conf overrides save/restore; EAGER like
    // f61 so the server stops before returning.
    "f73_s3_split_scan" -> ((s, _) => {
      val dir = gateDir("s3_split")
      graft.tools.Corpora.writeUnindexedVcfGz(s, dir.getAbsolutePath, 120000L)
      val gz = new java.io.File(dir, "calls.vcf.gz")
      val mini = new graft.tools.MiniS3()
        .withAuth("graft-gate-access", "graft-gate-secret").start()
      val hc = s.sparkContext.hadoopConfiguration
      val hcKeys = Seq("fs.s3.impl", "fs.s3.endpoint", "fs.s3.impl.disable.cache",
        "fs.s3.access.key", "fs.s3.secret.key")
      val hcSaved = hcKeys.map(k => k -> Option(hc.get(k)))
      val sqlKeys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val sqlSaved = sqlKeys.map(k => k -> s.conf.getOption(k))
      try {
        mini.put("graft-gate", "split/calls.vcf.gz",
          java.nio.file.Files.readAllBytes(gz.toPath))
        hc.set("fs.s3.impl", classOf[graft.sources.s3.S3HttpFileSystem].getName)
        hc.set("fs.s3.endpoint", mini.endpoint)
        hc.set("fs.s3.impl.disable.cache", "true")
        hc.set("fs.s3.access.key", "graft-gate-access")
        hc.set("fs.s3.secret.key", "graft-gate-secret")
        s.conf.set("spark.sql.files.maxPartitionBytes", "262144")
        s.conf.set("spark.sql.files.openCostInBytes", "262144")
        val df = s.read.format("vcf").load("s3://graft-gate/split/calls.vcf.gz")
          .select(col("pos"), col("info"))
        val parts = df.rdd.getNumPartitions
        require(parts >= 3,
          s"f73: index-free split over S3 did not engage: $parts partition(s)")
        val agg = df.agg(count(lit(1)).as("n"),
          sum(col("pos")).cast("long").as("sum_pos"),
          sum(length(col("info"))).cast("long").as("sum_info_len")).head
        import s.implicits._
        Seq((agg.getLong(0), agg.getLong(1), agg.getLong(2)))
          .toDF("n_full", "sum_pos", "sum_info_len")
      } finally {
        mini.stop()
        hcSaved.foreach { case (k, v) =>
          v match { case Some(x) => hc.set(k, x); case None => hc.unset(k) }
        }
        sqlSaved.foreach { case (k, v) =>
          v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
        }
      }
    }),

    "f69_bam_resync_split" -> ((s, _) => {
      val dir = gateDir("bam_resync")
      val bamDir = new java.io.File(dir, "t")
      if (!new java.io.File(dir, "_done").exists()) {
        s.range(0, 200000L).select(
            concat(lit("r"), col("id")).as("name"),
            lit(0).as("flag"),
            concat(lit("chr"), (col("id") % 2 + 1).cast("string")).as("reference"),
            ((col("id") / 2).cast("long") * 100 + 1).as("start"),
            ((col("id") / 2).cast("long") * 100 + 100).as("end"),
            lit("30").as("mapping_quality"),
            lit("100M").as("cigar"),
            lit(null).cast("string").as("mate_reference"),
            translate(substring(concat(md5(col("id").cast("string")),
                md5((col("id") + 200000L).cast("string")),
                md5((col("id") + 400000L).cast("string")),
                md5((col("id") + 600000L).cast("string"))), 1, 100),
              "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
            array_repeat(lit(30L), 100).as("quality_score"),
            array().cast("array<struct<tag:string,value:string>>").as("tags"))
          .repartitionByRange(1, col("reference"), col("start"))
          .sortWithinPartitions("reference", "start")
          .write.format("bam").mode("overwrite")
          .option("refs", "chr1:40000000,chr2:40000000")
          .save(bamDir.getAbsolutePath)
        // delete the sink's .bai: the gate is about the NO-index shape
        bamDir.listFiles().foreach { f =>
          if (f.getName.endsWith(".bai")) require(f.delete())
        }
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("bam").load(bamDir.getAbsolutePath)
          .select("reference", "start")
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"index-free BAM resync split did not engage: $parts partition(s)")
        val rows = df.groupBy(col("reference"))
          .agg(count(lit(1)).as("n"), sum(col("start")).cast("long").as("sum_start"))
          .orderBy("reference").collect()
        import s.implicits._
        rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toDF("reference", "n", "sum_start")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    "f67_bgzf_indexfree_split" -> ((s, _) => {
      val dir = gateDir("bgzf_indexfree")
      val f = new java.io.File(dir, "calls.vcf.gz")
      if (!new java.io.File(dir, "_done").exists()) {
        val fos = new java.io.FileOutputStream(f)
        try {
          val w = new graft.sources.BgzfWriter(
            new java.io.BufferedOutputStream(fos, 1 << 16))
          w.write(("##fileformat=VCFv4.2\n" +
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n").getBytes("UTF-8"))
          var c = 1
          while (c <= 2) {
            var i = 1
            while (i <= 100000) {
              w.write(s"chr$c\t${i * 3L}\t.\tA\tT\t30\tPASS\tDP=${i % 97}\n"
                .getBytes("UTF-8"))
              i += 1
            }
            c += 1
          }
          w.finish()
        } finally fos.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val keys = Seq("spark.sql.files.maxPartitionBytes",
        "spark.sql.files.openCostInBytes")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.files.maxPartitionBytes", "131072")
        s.conf.set("spark.sql.files.openCostInBytes", "16384")
        val df = s.read.format("vcf").load(f.getAbsolutePath)
          .select("chrom", "pos", "info")
        val parts = df.rdd.getNumPartitions
        require(parts >= 4,
          s"index-free BGZF split did not engage: $parts partition(s)")
        val rows = df.groupBy(col("chrom"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).cast("long").as("sum_pos"))
          .orderBy("chrom").collect()
        import s.implicits._
        rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toDF("chrom", "n", "sum_pos")
      } finally saved.foreach { case (k, v) =>
        v match { case Some(x) => s.conf.set(k, x); case None => s.conf.unset(k) }
      }
    }),

    "f58_sink_chain" -> ((s, _) => {
      val dir = gateDir("sink_chain").getAbsolutePath
      s.read.format("bam").load(s"$fx/bam/test.bam")
        .coalesce(1).sortWithinPartitions(col("reference"), col("start"))
        .write.format("bam").mode("overwrite")
        .option("headerFrom", s"$fx/bam/test.bam").save(s"$dir/b1")
      s.read.format("bam").load(s"$dir/b1")
        .coalesce(1).sortWithinPartitions(col("reference"), col("start"))
        .write.format("cram").mode("overwrite")
        .option("headerFrom", s"$fx/bam/test.bam").save(s"$dir/c1")
      s.read.format("cram").load(s"$dir/c1")
        .agg(count(lit(1)).as("n"), sum(col("flag")).as("sum_flag"),
          sum(col("start")).as("sum_start"))
    }),

    // CRAM/BCF table functions (beyond the reference's 17-UDTF surface):
    // cram_indexed_scan prunes containers via .crai + header coordinates,
    // bcf_indexed_scan via .csi — same counts the option-based reads prove
    // in f32/f21.
    "f42_cram_bcf_tvf" -> ((s, _) => {
      graft.GraftSession.registerAll(s)
      s.sql(
        s"""SELECT
           |  (SELECT count(*) FROM cram_scan(
           |     '$fx/cram/1404_index_multislice.cram')) AS n_cram,
           |  (SELECT count(*) FROM cram_indexed_scan(
           |     '$fx/cram/1404_index_multislice.cram',
           |     'CHROMOSOME_II')) AS n_cram_chr2,
           |  (SELECT count(*) FROM cram_indexed_scan(
           |     '$fx/cram/1404_index_multislice.cram',
           |     'CHROMOSOME_I:200-210')) AS n_cram_interval,
           |  (SELECT count(*) FROM bcf_indexed_scan(
           |     '$fx/bcf/index.bcf', '1')) AS n_bcf_chr1""".stripMargin)
    }),

    // SAM text sink: 1000 synthesized coordinate-sorted alignments written
    // as bgzf shards with .tbi siblings; full count, region count through
    // the sink's own index, and read-back identity are all arithmetic.
    "f43_sam_write_indexed" -> ((s, _) => {
      val dir = gateDir("sam_sink").getAbsolutePath
      val out = s"$dir/t"
      val src = s.range(0, 1000).select(
        concat(lit("r"), col("id")).as("name"),
        lit(0).as("flag"),
        when(col("id") < 600, "chr1").otherwise("chr2").as("reference"),
        (col("id") * 10 + 1).as("start"),
        (col("id") * 10 + 10).as("end"),
        lit("30").as("mapping_quality"),
        lit("10M").as("cigar"),
        lit(null).cast("string").as("mate_reference"),
        lit("ACGTACGTAC").as("sequence"),
        lit(null).cast("array<long>").as("quality_score"),
        // the reader yields [] (not null) for tag-less records
        array().cast("array<struct<tag:string,value:string>>").as("tags"))
      src.repartitionByRange(2, col("reference"), col("start"))
        .sortWithinPartitions("reference", "start")
        .write.format("sam").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val back = s.read.format("sam").load(out)
      val full = back.agg(count(lit(1)).as("n_full"))
      val diff = back.exceptAll(src).agg(count(lit(1)).as("n_diff"))
      val reg = s.read.format("sam").option("region", "chr1:1-3000")
        .load(out).agg(count(lit(1)).as("n_region"))
      full.crossJoin(diff).crossJoin(reg)
    }),

    // BED sink: fixture round trip (prefix-truncated columns) + region
    // read-back through the sink's own .tbi.
    "f44_bed_write_indexed" -> ((s, _) => {
      val dir = gateDir("bed_sink").getAbsolutePath
      val out = s"$dir/t"
      val src = s.read.format("bed").load(s"$fx/bed/test.bed")
      src.repartitionByRange(1, col("reference_sequence_name"), col("start"))
        .sortWithinPartitions("reference_sequence_name", "start")
        .write.format("bed").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val back = s.read.format("bed").load(out)
      val full = back.agg(count(lit(1)).as("n_full"))
      val diff = back.exceptAll(src).agg(count(lit(1)).as("n_diff"))
      val reg = s.read.format("bed").option("region", "chr1:11874-12300")
        .load(out).agg(count(lit(1)).as("n_region"))
      full.crossJoin(diff).crossJoin(reg)
    }),

    // GTF sink: fixture round trip (quoted-attribute form) + region
    // read-back through the sink's own .tbi.
    "f45_gtf_write_indexed" -> ((s, _) => {
      val dir = gateDir("gtf_sink").getAbsolutePath
      val out = s"$dir/t"
      val src = s.read.format("gtf").load(s"$fx/gtf/test.gtf")
      src.repartitionByRange(1, col("seqname"), col("start"))
        .sortWithinPartitions("seqname", "start")
        .write.format("gtf").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val back = s.read.format("gtf").load(out)
      // set ops refuse MAP columns; write/read both preserve attribute
      // order, so to_json is a faithful canonical form for the diff
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("attributes", to_json(col("attributes")))
      val full = back.agg(count(lit(1)).as("n_full"))
      val diff = canon(back).exceptAll(canon(src))
        .agg(count(lit(1)).as("n_diff"))
      val reg = s.read.format("gtf").option("region", "chr1:12000-12999")
        .load(out).agg(count(lit(1)).as("n_region"))
      full.crossJoin(diff).crossJoin(reg)
    }),

    // FASTA sink with .fai siblings: 40 synthesized sequences, then a
    // subsequence region read served by the sink's own index (samtools
    // faidx semantics — id column carries the region string back).
    "f46_fasta_write_fai" -> ((s, _) => {
      val dir = gateDir("fasta_fai").getAbsolutePath
      val out = s"$dir/t"
      val src = s.range(0, 40).select(
        concat(lit("s"), col("id")).as("id"),
        lit(null).cast("string").as("description"),
        // deterministic per-id sequence: "ACGT" repeated (id % 5 + 3) times
        expr("repeat('ACGT', id % 5 + 3)").as("sequence"))
      src.coalesce(2).write.format("fasta").mode("overwrite").save(out)
      val sub = s.read.format("fasta").option("region", "s7:3-10").load(out)
        .select(col("sequence").as("sub"))
      val full = s.read.format("fasta").load(out)
        .agg(count(lit(1)).as("n_full"),
          sum(length(col("sequence"))).as("sum_len"))
      full.crossJoin(sub)
    }),

    // WHERE-derived MULTI-region index pruning: `seqname IN (...)` and an OR
    // of per-chrom region conjuncts both feed the same tabix chunk-pruning
    // path as the region/regionFile options (the reference accepts region
    // LISTS via region files, fasta_indexed_scan.rs:62-125). The filters
    // stay residual, so results are exact; PlanAuditSpec asserts both
    // regions reach the scan.
    "f47_multi_region_where" -> ((s, _) => {
      val p = s"$fx/gff-index/gencode.v38.polyAs.gff.gz"
      val inBoth = s.read.format("gff").load(p)
        .filter(col("seqname").isin("chr1", "chr2"))
        .agg(count(lit(1)).as("n_in"))
      val orRegions = s.read.format("gff").load(p)
        .filter((col("seqname") === "chr1" &&
                 col("start") <= 200000 && col("end") >= 100000) ||
                col("seqname") === "chr2")
        .agg(count(lit(1)).as("n_or"))
      inBoth.crossJoin(orRegions)
    }),

    // Variant annotation — the canonical genomics interval op: every VCF
    // variant gets its nearest GFF feature within a 1 Mb window via a
    // BANDED range join (the q41 shape on format sources): features
    // explode to their ±1 band range of 1 Mb buckets, variants carry one
    // bucket, and the join is keyed on (seqname, band) — never all-pairs,
    // so 1e9 variants × 1e6 features stays a keyed shuffle whose per-key
    // width is the local feature density. Nearest = min(struct(dist,
    // start, type)) per variant: 0 inside [start, end], else gap to the
    // closer edge, ties to the lower start. Pinned by tools/pin_f48.py
    // (independent raw-text parse of both fixtures).
    "f48_variant_annotation" -> ((s, _) => {
      val W = 1000000L
      // Multiplicity folds in BEFORE the join (the fixture has one fully
      // duplicated variant line), so the join input is already distinct.
      val vcf = s.read.format("vcf").load(s"$fx/biobear-vcf/vcf_file.vcf.gz")
        .select(concat(lit("chr"), col("chrom")).as("seqname"),
          col("pos"), col("ref"))
        .groupBy(col("seqname"), col("pos"), col("ref"))
        .agg(count(lit(1)).as("n_var"))
        .withColumn("band", expr(s"pos div ${W}L"))
      val feats = s.read.format("gff")
        .load(s"$fx/gff-index/gencode.v38.polyAs.gff.gz")
        .select(col("seqname"), col("start"), col("end"), col("type"))
        .withColumn("band",
          explode(expr(s"sequence(`start` div ${W}L - 1, `end` div ${W}L + 1)")))
      vcf.join(feats, Seq("seqname", "band"))
        .filter(col("start") <= col("pos") + W && col("end") >= col("pos") - W)
        .withColumn("dist",
          when(col("pos") >= col("start") && col("pos") <= col("end"), 0L)
            .otherwise(when(col("pos") < col("start"), col("start") - col("pos"))
              .otherwise(col("pos") - col("end"))))
        .groupBy(col("seqname"), col("pos"), col("ref"))
        .agg(max(col("n_var")).as("n_var"),
          min(struct(col("dist"), col("start"), col("type"))).as("nf"))
        .select(col("seqname"), col("pos"), col("ref"), col("n_var"),
          col("nf.dist").as("dist"), col("nf.start").as("f_start"),
          col("nf.type").as("f_type"))
        .orderBy(col("pos"), col("ref"))
    }),

    // BAM coverage depth (the samtools-depth pileup profile) by exact
    // sweep line: each mapped read's [start, end] reference span (end from
    // CIGAR reference consumption) contributes +1/-1 breakpoint deltas;
    // depth is the running sum over a reference-keyed window; constant-
    // depth segments between consecutive breakpoints give covered bases,
    // max depth, and total depth mass. This is q48's proven shape on a
    // format source. At 100 TB the window key becomes (reference, 16 kb
    // tile) with reads clipped per tile so no single contig serializes
    // into one task. Pinned by tools/pin_f49.py (independent binary BAM
    // parse, no graft code).
    "f49_bam_depth" -> ((s, _) => {
      val reads = s.read.format("bam").load(s"$fx/bam/test.bam")
        .filter(col("reference").isNotNull && col("start").isNotNull &&
          col("end") >= col("start"))
        .select(col("reference"), col("start"), col("end"))
      val deltas = reads
        .select(col("reference"), explode(array(
          struct(col("start").as("pos"), lit(1L).as("d")),
          struct((col("end") + 1L).as("pos"), lit(-1L).as("d")))).as("e"))
        .groupBy(col("reference"), col("e.pos").as("pos"))
        .agg(sum(col("e.d")).as("d"))
      val w = Window.partitionBy(col("reference")).orderBy(col("pos"))
      val segs = deltas
        .withColumn("depth", sum(col("d")).over(w))
        .withColumn("nxt", lead(col("pos"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("len", col("nxt") - col("pos"))
      segs.groupBy(col("reference"))
        .agg(sum(when(col("depth") > 0, col("len")).otherwise(0L)).as("covered_bases"),
          max(col("depth")).as("max_depth"),
          sum(col("depth") * col("len")).as("sum_depth"))
        .join(reads.groupBy(col("reference")).agg(count(lit(1)).as("n_reads")),
          Seq("reference"))
        .select(col("reference"), col("n_reads"), col("covered_bases"),
          col("max_depth"), col("sum_depth"))
        .orderBy(col("reference"))
    }),

    // FASTQ 3'-end quality trimming (the Trimmomatic TRAILING /
    // seqtk-trimfq preprocessing op): a read's trimmed length is the last
    // position whose Phred score clears Q30, computed entirely inside
    // whole-stage codegen by higher-order functions over the existing
    // quality_scores_to_list expression — no UDF, no extra pass, a pure
    // per-row map that fuses into the scan at any scale. Expected values
    // derived by hand from the fixture's Phred+33 string (both reads share
    // it; last >= '?' char is position 58; the fixture's sequence is 4
    // chars longer than its quality string — zip_with's null padding
    // contributes zeros, exercising the ragged edge).
    "f50_fastq_trim" -> ((s, _) => {
      val r = s.read.format("fastq").load(s"$fx/fastq/test.fastq")
        .withColumn("q", expr("quality_scores_to_list(quality_scores)"))
        .withColumn("trim_len", expr(
          "coalesce(array_max(zip_with(q, sequence(1, size(q))," +
            " (qi, i) -> IF(qi >= 30, i, 0))), 0)"))
      r.agg(count(lit(1)).as("n_reads"),
        sum(length(col("sequence"))).cast("long").as("sum_len"),
        sum(col("trim_len")).cast("long").as("sum_trimmed"),
        sum(when(col("trim_len") === 0, 1L).otherwise(0L)).as("n_dropped"))
    }),

    // Dirty-attribute GFF round trip: reserved characters (';' '=' ',' '%')
    // plus literal tab/newline inside attribute values must survive
    // write -> percent-encode -> parse -> decode without corrupting record
    // framing (GFF3 column-9 encoding rules).
    "f38_gff_dirty_attrs" -> ((s, _) => {
      import s.implicits._
      val dir = gateDir("gff_dirty").getAbsolutePath
      val out = s"$dir/t"
      val rows = Seq(
        ("chr1", 10L, 20L, "gene",
          Map("ID" -> Seq("g;1"), "Note" -> Seq("a=b", "c,d"))),
        ("chr1", 30L, 45L, "mRNA",
          Map("ID" -> Seq("m%1"), "Desc" -> Seq("tab\there", "line\nbreak"))),
        ("chr2", 5L, 9L, "exon",
          Map("Name" -> Seq("100%,done;ok=yes"))))
        .toDF("seqname", "start", "end", "type", "attributes")
      rows.select(
          col("seqname"), lit(null).cast("string").as("source"), col("type"),
          col("start"), col("end"), lit(null).cast("float").as("score"),
          lit("+").as("strand"), lit(null).cast("string").as("phase"),
          col("attributes"))
        .write.format("gff").mode("overwrite").save(out)
      s.read.format("gff").load(out)
        .select(col("seqname"), col("start"), explode(col("attributes")))
        .select(col("seqname"), col("start"), col("key"),
          array_join(col("value"), "|").as("value"))
        .orderBy("seqname", "start", "key")
    }),

    // bzip2 / xz compression by extension (exon_file_type.rs:179-206): the
    // fixture FASTA re-compressed with commons-compress, read back through
    // the scan machinery.
    "f33_bzip2_xz" -> ((s, _) => {
      val dir = gateDir("codec_gate").getAbsolutePath
      if (!new java.io.File(dir, "_done").exists()) {
        val raw = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$fx/fasta/test.fasta"))
        val bzo = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
          java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/t.fasta.bz2")))
        bzo.write(raw); bzo.close()
        val xzo = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(
          java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/t.fasta.xz")))
        xzo.write(raw); xzo.close()
        new java.io.File(dir, "_done").createNewFile()
      }
      val bz = s.read.format("fasta").load(s"$dir/t.fasta.bz2")
        .agg(count(lit(1)).as("n_bz2"), sum(length(col("sequence"))).as("len_bz2"))
      val xz = s.read.format("fasta").load(s"$dir/t.fasta.xz")
        .agg(count(lit(1)).as("n_xz"), sum(length(col("sequence"))).as("len_xz"))
      bz.crossJoin(xz)
    }),

    // sequenceDataType integer encoding (reference exon-fasta config.rs:
    // 166-210): DNA A/C/G/T/N -> 1..5, protein index+1 in the reference's
    // 25-letter alphabet; graded as a joined code string.
    "f34_fasta_integer" -> ((s, _) => {
      val dna = s.read.format("fasta")
        .option("sequenceDataType", "integer_encode_dna")
        .load(s"$fx/fasta/test.fasta")
        .select(lit("dna").as("kind"), col("id"),
          array_join(col("sequence").cast("array<string>"), ",").as("codes"))
      val prot = s.read.format("fasta")
        .option("sequenceDataType", "integer_encode_protein")
        .load(s"$fx/faa/test.faa")
        .select(lit("protein").as("kind"), col("id"),
          array_join(col("sequence").cast("array<string>"), ",").as("codes"))
      dna.unionAll(prot).orderBy("kind", "id")
    }),

    // CRAM .crai container pruning: region scans decode only overlapping
    // containers (CramSpec asserts 6 of 7 data containers are skipped for
    // the CHROMOSOME_II query); counts pinned from the unpruned row-filter.
    "f32_cram_crai_region" -> ((s, _) => {
      val p = s"$fx/cram/1404_index_multislice.cram"
      val chr2 = s.read.format("cram").option("region", "CHROMOSOME_II").load(p)
        .agg(count(lit(1)).as("n_chr2"))
      val interval = s.read.format("cram").option("region", "CHROMOSOME_I:200-210")
        .load(p).agg(count(lit(1)).as("n_interval"))
      val whole = s.read.format("cram").load(p).agg(count(lit(1)).as("n_all"))
      chr2.crossJoin(interval).crossJoin(whole)
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

    // SDF: $$$$-delimited molecules, gzip, inferred data struct
    "f15_sdf_scan" -> ((s, _) => {
      val df = s.read.format("sdf").load(s"$fx/sdf/tox_benchmark_N6512.sdf.gz")
      val agg = df.agg(count(lit(1)).as("n"), sum(col("atom_count")).as("sum_atoms"),
        sum(col("bond_count")).as("sum_bonds"))
      val first = df.limit(1).select(col("header"), col("atom_count"), col("bond_count"))
      agg.crossJoin(first)
    }),

    // GenBank: LOCUS-driven scalars + sequence + features
    "f16_genbank_scan" -> ((s, _) =>
      s.read.format("genbank").load(s"$fx/genbank/test.gb")
        .select(col("name"), col("accession"), col("division"), col("topology"),
          col("molecule_type"),
          length(col("sequence")).as("seq_len"), size(col("features")).as("n_features"))),

    // mzML: StAX + base64/zlib binary arrays, mass-spec function goldens
    "f17_mzml_scan" -> ((s, _) => {
      graft.GraftSession.registerAll(s)
      val df = s.read.format("mzml").load(s"$fx/mzml-pyoteomics/pyoteomics.mzML")
      df.createOrReplaceTempView("f17_mzml")
      s.sql(
        """SELECT count(*) AS n,
          |  sum(CASE WHEN contains_peak(mz.mz, 200.0D, 1.0D) THEN 1 ELSE 0 END) AS n_peak
          |FROM f17_mzml""".stripMargin)
    }),

    // Mass-spec peak analytics over the decoded binary arrays: base peak
    // (argmax intensity via array_position — ties take the first index,
    // i.e. the smallest m/z on ascending arrays) and total ion current as
    // a sequential HOF fold, all codegen'd array expressions — no UDF, no
    // explode. Oracle pinned by an independent Python base64+zlib+struct
    // decode of the same fixture (sequential float64 sum matches the
    // fold's evaluation order exactly).
    "f57_mzml_peaks" -> ((s, _) =>
      s.read.format("mzml").load(s"$fx/mzml-pyoteomics/pyoteomics.mzML")
        .select(col("id"),
          size(col("mz.mz")).cast("long").as("n_points"),
          expr("element_at(mz.mz, CAST(array_position(intensity.intensity," +
            " array_max(intensity.intensity)) AS INT))").as("base_mz"),
          expr("array_max(intensity.intensity)").as("base_intensity"),
          expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)").as("tic"))
        .orderBy("id")),

    // FCS binary reader over a synthesized FCS3.0 file (reference fixture
    // not shipped in this checkout)
    "f18_fcs_scan" -> ((s, _) => {
      val dir = gateDir("fcs")
      val f = new java.io.File(dir, "synth.fcs")
      val done = new java.io.File(dir, "_done")
      if (!done.exists()) {
        val text = "/$PAR/3/$TOT/2/$DATATYPE/F/$BYTEORD/1,2,3,4" +
          "/$P1S/FSC-A/$P2S/SSC-A/$P3S/FL1-A/"
        val textStart = 58
        val textEnd = textStart + text.length - 1
        val dataStart = textStart + text.length
        val dataEnd = dataStart + 2 * 3 * 4 - 1
        val header = f"FCS3.0    $textStart%8d$textEnd%8d$dataStart%8d$dataEnd%8d${0}%8d${0}%8d"
        val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
        out.writeBytes(header); out.writeBytes(text)
        Seq(1.5f, 2.5f, 3.5f, 4.0f, 5.0f, 6.0f).foreach { v =>
          out.writeInt(Integer.reverseBytes(java.lang.Float.floatToIntBits(v)))
        }
        out.close()
        done.createNewFile()
      }
      s.read.format("fcs").load(f.getAbsolutePath)
        .select(col("FSC-A").as("fsc"), col("SSC-A").as("ssc"), col("FL1-A").as("fl1"))
        .orderBy(col("fsc"))
    }),

    // BAM binary reader: counts + the indexed-slt golden first row
    "f19_bam_scan" -> ((s, _) => {
      val df = s.read.format("bam").load(s"$fx/bam/test.bam")
      val agg = df.agg(count(lit(1)).as("n"))
      val part = s.read.format("bam").load(s"$fx/bam-partition")
        .agg(count(lit(1)).as("n_part"))
      val first = df.limit(1).select(col("name"), col("flag"), col("reference"),
        col("start"), col("end"), col("cigar"))
      agg.crossJoin(part).crossJoin(first)
    }),

    // .bai-indexed BAM region (overlap semantics; golden 7 / 14)
    "f20_bam_indexed_region" -> ((s, _) => {
      val one = s.read.format("bam")
        .option("region", "chr1:1-12209145").load(s"$fx/bam/test.bam")
        .agg(count(lit(1)).as("n_region"))
      val both = s.read.format("bam")
        .option("region", "chr1:1-12209145").load(s"$fx/bam-partition")
        .agg(count(lit(1)).as("n_region_part"))
      one.crossJoin(both)
    }),

    // BCF binary reader: total + region counts, plus exact variant-level
    // agreement with the VCF text reader over the same callset
    "f21_bcf_scan" -> ((s, _) => {
      val bcf = s.read.format("bcf").load(s"$fx/bcf/index.bcf")
      val agg = bcf.agg(count(lit(1)).as("n"))
      val reg = s.read.format("bcf").option("region", "1").load(s"$fx/bcf/index.bcf")
        .agg(count(lit(1)).as("n_chr1"))
      val vcf = s.read.format("vcf").load(s"$fx/vcf/index.vcf")
        .select("chrom", "pos", "ref", "qual")
      val diff = bcf.select("chrom", "pos", "ref", "qual").exceptAll(vcf)
        .agg(count(lit(1)).as("n_diff"))
      agg.crossJoin(reg).crossJoin(diff)
    }),

    // BigWig interval values (0-based half-open; bigwig-tests.slt golden)
    "f22_bigwig_value" -> ((s, _) =>
      s.read.format("bigwig_value").load(s"$fx/bigwig/test.bw")
        .orderBy(col("name"), col("start"))),

    // BigWig zoom summaries at reduction level 400
    "f23_bigwig_zoom" -> ((s, _) =>
      s.read.format("bigwig_zoom").option("reductionLevel", "400")
        .load(s"$fx/bigwig/test.bw")
        .select(col("name"), col("start"), col("end"), col("total_items"),
          col("bases_covered"), round(col("max_value"), 6).as("max_v"),
          round(col("min_value"), 6).as("min_v"),
          round(col("sum_squares"), 4).as("sum_sq"), round(col("sum"), 4).as("sum_v"))
        .orderBy(col("name"))),

    // fasta_indexed_scan parity: region + regionFile subsequence extraction
    "f24_fasta_indexed" -> ((s, _) => {
      val sub = s.read.format("fasta").option("region", "a:3-4")
        .load(s"$fx/fasta-indexed/test.fasta")
      val multi = s.read.format("fasta")
        .option("regionFile", s"$fx/fasta-indexed/region.txt")
        .load(s"$fx/fasta-indexed/test.fasta")
      sub.union(multi).orderBy(col("id"), col("sequence"))
    }),

    // extension-inferred reads (read_inferred_exon_table parity)
    "f25_inferred_format" -> ((s, _) => {
      val a = s.read.format("graft").load(s"$fx/fastq/test.fastq.gz")
        .agg(count(lit(1)).as("n_fastq"))
      val b = s.read.format("graft").load(s"$fx/vcf/index.vcf.gz")
        .agg(count(lit(1)).as("n_vcf"))
      val c = s.read.format("graft").load(s"$fx/bam/test.bam")
        .agg(count(lit(1)).as("n_bam"))
      a.crossJoin(b).crossJoin(c)
    }),

    // header-driven typed INFO/FORMAT parsing (vcf_parse_info/formats mode)
    "f26_vcf_typed" -> ((s, _) =>
      s.read.format("vcf").option("parseInfo", "true").option("parseFormats", "true")
        .load(s"$fx/vcf/index.vcf")
        .limit(1)
        .select(col("info.DP").as("dp"), col("info.MQ0F").as("mq0f"),
          element_at(col("info.I16"), 5).as("i16_5"),
          col("formats")(0).getField("GT").as("gt"),
          element_at(col("formats")(0).getField("PL"), 3).as("pl_3"))),

    // inferred typed SAM tags (sam_parse_tags mode)
    "f27_sam_typed_tags" -> ((s, _) =>
      s.read.format("sam").option("parseTags", "true").load(s"$fx/sam/test.sam")
        .limit(1)
        .select(col("tags.za").as("za"), col("tags.RG").as("rg"),
          element_at(col("tags.bb"), 3).as("bb_3"), col("tags.NM").as("nm"),
          col("tags.fa").as("fa"))),

    // CRAM 3.0: golden first record + fixture counts (multislice = 910)
    "f28_cram_scan" -> ((s, _) => {
      val first = s.read.format("cram").load(s"$fx/cram/test_input_1_a.cram")
        .limit(1)
        .select(col("name"), col("flag"), col("reference"), col("start"), col("end"),
          col("mapping_quality"), col("cigar"), col("mate_reference"))
      val n1 = s.read.format("cram").load(s"$fx/cram/test_input_1_a.cram")
        .agg(count(lit(1)).as("n"))
      val n2 = s.read.format("cram").load(s"$fx/two-cram/twolib.sorted.cram")
        .agg(count(lit(1)).as("n_two"))
      val n3 = s.read.format("cram").load(s"$fx/cram/1404_index_multislice.cram")
        .agg(count(lit(1)).as("n_multi"))
      first.crossJoin(n1).crossJoin(n2).crossJoin(n3)
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

  /** Shared f52/f53 input: hourly event-count track, one chromosome per
    * event_type, 100 coordinate units per hour from the corpus' first
    * hour. Range-partitioned by chrom so each sink shard owns whole
    * chromosomes (zoom bins never straddle part files).
    */
  private def bigwigTrack(s: SparkSession, d: String): DataFrame = {
    val hours = Tables.events(s, d).select(col("event_type").as("name"),
      expr("unix_micros(ts) div 3600000000").as("h"))
    val h0 = hours.agg(min(col("h")).as("h0"))
    hours.groupBy(col("name"), col("h")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(h0))
      .select(col("name"),
        ((col("h") - col("h0")) * 100).cast("int").as("start"),
        ((col("h") - col("h0")) * 100 + 100).cast("int").as("end"),
        col("n").cast("float").as("value"))
      .repartitionByRange(4, col("name"))
  }

  val oracles: Map[String, String] = Map(
    // Pinned from an independent Python base64+zlib+struct decode of the
    // pyoteomics fixture.
    "f57_mzml_peaks" ->
      """SELECT * FROM (VALUES
        |  ('controllerType=0 controllerNumber=1 scan=1', CAST(19914 AS BIGINT), CAST(810.4154747204038 AS DOUBLE), CAST(1471224.875 AS DOUBLE), CAST(69381842.11895752 AS DOUBLE)),
        |  ('controllerType=0 controllerNumber=1 scan=2', CAST(19914 AS BIGINT), CAST(810.4154663085938 AS DOUBLE), CAST(1471224.875 AS DOUBLE), CAST(69381842.11895752 AS DOUBLE)))
        |t(id, n_points, base_mz, base_intensity, tic)
        |ORDER BY id""".stripMargin,

    // Pinned from an independent Python text parse of index.vcf.gz
    // (2 SNPs — both transitions — among 621 mostly-indel records).
    "f56_vcf_stats" ->
      """SELECT CAST(621 AS BIGINT) AS n_records,
        |  CAST(2 AS BIGINT) AS n_multiallelic, CAST(2 AS BIGINT) AS n_snp,
        |  CAST(2 AS BIGINT) AS n_ts, CAST(0 AS BIGINT) AS n_tv,
        |  CAST(621 AS BIGINT) AS n_indel""".stripMargin,

    // Same independent parse as f55 pins the chain-end sums.
    "f58_sink_chain" ->
      """SELECT CAST(61 AS BIGINT) AS n, CAST(12417 AS BIGINT) AS sum_flag,
        |  CAST(744752726 AS BIGINT) AS sum_start""".stripMargin,

    // 500 seqs of length 4*(1 + i%9): sum(i%9 for i in 0..499) =
    // 55 full cycles * 36 + (0+1+2+3+4) = 1990, so total len =
    // 4 * (500 + 1990) = 9960
    "f60_zstd_scan" ->
      """SELECT CAST(500 AS BIGINT) AS n_raw, CAST(9960 AS BIGINT) AS len_raw,
        |  CAST(500 AS BIGINT) AS n_zst, CAST(9960 AS BIGINT) AS len_zst""".stripMargin,

    "f63_extensions_sql" ->
      "SELECT 'CGAT' AS rc, true AS unmapped, CAST(2 AS BIGINT) AS n_fasta",

    "f64_safety_refusals" ->
      """SELECT true AS unsorted_refused, true AS version_refused,
        |  true AS magic_refused""".stripMargin,

    // 10k rows, pos=(k/2)*37+11; region chrB:1000-50000 = odd k with
    // k/2 in [ceil(989/37), floor(49989/37)] = [27, 1351]
    "f66_bcf_sink" ->
      """SELECT CAST(10000 AS BIGINT) AS n,
        |  CAST((SELECT SUM((k // 2) * 37 + 11) FROM range(0, 10000) t(k)) AS BIGINT)
        |    AS sum_pos,
        |  CAST((SELECT SUM(CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END)
        |        FROM range(0, 10000) t(k)) AS BIGINT) AS n_q10,
        |  CAST((SELECT SUM(CASE WHEN k % 6 = 0 THEN 1 ELSE 0 END)
        |        FROM range(0, 10000) t(k)) AS BIGINT) AS n_db,
        |  CAST((SELECT SUM(CASE WHEN k % 2 = 1 AND (k // 2) BETWEEN 27 AND 1351
        |        THEN 1 ELSE 0 END) FROM range(0, 10000) t(k)) AS BIGINT) AS n_region""".stripMargin,

    // 200k records, flag=id%2, start=(id/4)*150+1 per ref, 4 refs x 50k
    "f65_bgzf_fullscan_split" ->
      """SELECT CAST(200000 AS BIGINT) AS n,
        |  CAST(100000 AS BIGINT) AS sum_flag,
        |  CAST((SELECT 4 * SUM(k * 150 + 1) FROM range(0, 50000) t(k)) AS BIGINT)
        |    AS sum_start,
        |  CAST(50000 AS BIGINT) AS n_chr2""".stripMargin,

    // 9600 sequences, lengths 200 + id%7, every sequence a prefix of the
    // repeated 5-base pattern — region substrings are closed-form
    "f68_fasta_bgzf_indexed" ->
      """SELECT CAST(9600 AS BIGINT) AS n,
        |  CAST((SELECT 9600 * 200 + SUM(i % 7)
        |        FROM generate_series(0, 9599) t(i)) AS BIGINT) AS sum_len,
        |  substring(repeat('ACGTG', 42), 7, 30) AS sub1,
        |  substring(repeat('ACGTG', 42), 1, 203) AS sub2""".stripMargin,

    // 2 chroms x 100k rows, pos = 3i: sum_pos = 3 * 100000*100001/2
    // 100k records per chrom, start = k*100+1 for k in 0..99999:
    // sum = 100 * 99999*100000/2 + 100000 = 499995100000
    // 200k records, ids 0..199999: ids%3==0 -> 66667; sum ids =
    // 199999*200000/2; fixed 80-base sequences
    "f71_fastq_split" ->
      """SELECT CAST(200000 AS BIGINT) AS n, CAST(66667 AS BIGINT) AS n_at_qual,
        |  CAST(19999900000 AS BIGINT) AS sum_name_id,
        |  CAST(16000000 AS BIGINT) AS sum_seq_len""".stripMargin,

    "f72_fastq_bgzf_split" ->
      """SELECT CAST(200000 AS BIGINT) AS n, CAST(66667 AS BIGINT) AS n_at_qual,
        |  CAST(19999900000 AS BIGINT) AS sum_name_id,
        |  CAST(16000000 AS BIGINT) AS sum_seq_len""".stripMargin,

    // 60k records per chrom, start = k*100+1 for k in 0..59999:
    // sum = 100 * 59999*60000/2 + 60000 = 179997060000
    "f70_cram_aligned_split" ->
      """SELECT 'chr' || CAST(i AS VARCHAR) AS reference,
        |  CAST(60000 AS BIGINT) AS n,
        |  CAST(179997060000 AS BIGINT) AS sum_start
        |FROM generate_series(1, 2) t(i) ORDER BY reference""".stripMargin,

    // same corpus + oracle as f70: the sweep fallback must agree exactly
    "f74_cram_sweep_split" ->
      """SELECT 'chr' || CAST(i AS VARCHAR) AS reference,
        |  CAST(60000 AS BIGINT) AS n,
        |  CAST(179997060000 AS BIGINT) AS sum_start
        |FROM generate_series(1, 2) t(i) ORDER BY reference""".stripMargin,

    // record k carries a (100 + (k%7)*10)-base sequence and one
    // locus_tag=LTk qualifier; every one must survive the split parse
    "f75_genbank_split" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(100 + (k % 7) * 10) AS BIGINT) AS sum_seq_len,
        |  CAST(count(*) AS BIGINT) AS n_tagged
        |FROM generate_series(0, 19999) t(k)""".stripMargin,

    // spectrum i: 50 intensities (i*31 + j*17) % 10000, integral doubles
    "f78_mzml_split" ->
      """SELECT CAST(8000 AS BIGINT) AS n,
        |  CAST(8000 * 50 AS BIGINT) AS sum_n_mz,
        |  CAST(sum((i * 31 + j * 17) % 10000) AS BIGINT) AS sum_inten
        |FROM generate_series(0, 7999) t(i), generate_series(0, 49) u(j)""".stripMargin,

    // event i: param p = (i*7 + p*3) % 16381, integral floats
    "f77_fcs_split" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum((i * 7) % 16381) AS BIGINT) AS sum_fsc,
        |  CAST(sum((i * 7 + 15) % 16381) AS BIGINT) AS sum_time
        |FROM generate_series(0, 399999) t(i)""".stripMargin,

    // 30k molecules, 2 atoms each, data item id=k
    "f76_sdf_split" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(2) AS BIGINT) AS sum_atoms,
        |  CAST(sum(k) AS BIGINT) AS sum_id
        |FROM generate_series(0, 29999) t(k)""".stripMargin,

    "f69_bam_resync_split" ->
      """SELECT 'chr' || CAST(i AS VARCHAR) AS reference,
        |  CAST(100000 AS BIGINT) AS n,
        |  CAST(499995100000 AS BIGINT) AS sum_start
        |FROM generate_series(1, 2) t(i) ORDER BY reference""".stripMargin,

    // Corpora.writeUnindexedVcfGz shape: pos=(i//8)*40+1, info='DP=' ||
    // (i%100) || ';H=' || md5(i) — info length is 38 + digits(i%100)
    "f73_s3_split_scan" ->
      """WITH rows AS (
        |  SELECT (i // 8) * 40 + 1 AS pos,
        |         38 + length(CAST(i % 100 AS VARCHAR)) AS ilen
        |  FROM generate_series(0, 119999) t(i))
        |SELECT count(*) AS n_full,
        |  CAST(sum(pos) AS BIGINT) AS sum_pos,
        |  CAST(sum(ilen) AS BIGINT) AS sum_info_len
        |FROM rows""".stripMargin,

    "f67_bgzf_indexfree_split" ->
      """SELECT 'chr' || CAST(i AS VARCHAR) AS chrom,
        |  CAST(100000 AS BIGINT) AS n,
        |  CAST(15000150000 AS BIGINT) AS sum_pos
        |FROM generate_series(1, 2) t(i) ORDER BY chrom""".stripMargin,

    // all three encodings must reproduce the htslib original's aggregates
    "f62_cram31_scan" ->
      """SELECT CAST(15 AS BIGINT) AS n_30, CAST(576 AS BIGINT) AS flag_30,
        |  CAST(282 AS BIGINT) AS start_30, CAST(250 AS BIGINT) AS seq_30,
        |  CAST(15 AS BIGINT) AS n_31, CAST(576 AS BIGINT) AS flag_31,
        |  CAST(282 AS BIGINT) AS start_31, CAST(250 AS BIGINT) AS seq_31,
        |  CAST(15 AS BIGINT) AS n_31a, CAST(576 AS BIGINT) AS flag_31a,
        |  CAST(282 AS BIGINT) AS start_31a, CAST(250 AS BIGINT) AS seq_31a""".stripMargin,

    "f61_s3_region" ->
      """WITH rows AS (
        |  SELECT 'chr' || CAST(i // 2000 AS VARCHAR) AS chrom,
        |         (i % 2000) * 150 + 1 AS pos,
        |         CAST(i % 60 AS DOUBLE) AS qual
        |  FROM generate_series(0, 7999) t(i))
        |SELECT (SELECT count(*) FROM rows) AS n_full,
        |  (SELECT count(*) FROM rows
        |     WHERE chrom = 'chr2' AND pos BETWEEN 150001 AND 300001) AS n_region,
        |  (SELECT CAST(sum(qual) AS BIGINT) FROM rows
        |     WHERE chrom = 'chr2' AND pos BETWEEN 150001 AND 300001) AS sum_qual""".stripMargin,

    // 100 rows, span 5 each; sum(score) = sum(i % 50 for i in 0..99) = 2450
    "f59_bed_nfields" ->
      """SELECT CAST(100 AS BIGINT) AS n, CAST(4 AS BIGINT) AS n_cols_4,
        |  CAST(12 AS BIGINT) AS n_cols_12, CAST(500 AS BIGINT) AS sum_span,
        |  CAST(2450 AS BIGINT) AS sum_score""".stripMargin,

    // Pinned by tools/pin_f55.py (independent Python gzip+struct BAM parse).
    "f55_bam_flagstat" ->
      """SELECT CAST(61 AS BIGINT) AS total, CAST(61 AS BIGINT) AS mapped,
        |  CAST(61 AS BIGINT) AS paired, CAST(58 AS BIGINT) AS proper_pair,
        |  CAST(59 AS BIGINT) AS reverse, CAST(34 AS BIGINT) AS first_seg,
        |  CAST(27 AS BIGINT) AS last_seg, CAST(0 AS BIGINT) AS secondary,
        |  CAST(7 AS BIGINT) AS qc_fail, CAST(0 AS BIGINT) AS dup,
        |  CAST(1 AS BIGINT) AS supplementary""".stripMargin,

    "f52_bigwig_write_roundtrip" ->
      """WITH h AS (SELECT event_type AS name,
        |    epoch_us(ts) // 3600000000 AS hr FROM events),
        |h0 AS (SELECT min(hr) AS h0 FROM h)
        |SELECT name, CAST((hr - h0) * 100 AS INT) AS start,
        |  CAST((hr - h0) * 100 + 100 AS INT) AS "end",
        |  CAST(count(*) AS REAL) AS value
        |FROM h, h0 GROUP BY 1, 2, 3
        |ORDER BY name, start""".stripMargin,

    "f53_bigwig_write_zoom" ->
      """WITH h AS (SELECT event_type AS name,
        |    epoch_us(ts) // 3600000000 AS hr FROM events),
        |h0 AS (SELECT min(hr) AS h0 FROM h),
        |t AS (SELECT name, (hr - h0) * 100 AS start, count(*) AS n
        |  FROM h, h0 GROUP BY 1, 2),
        |ext AS (SELECT name, max(start + 100) AS csize FROM t GROUP BY name),
        |b AS (SELECT name, start // 1000 AS bin, count(*) AS k,
        |    max(n) AS mx, min(n) AS mn, sum(n * n) AS sq, sum(n) AS sm
        |  FROM t GROUP BY 1, 2)
        |SELECT b.name, CAST(bin * 1000 AS INT) AS start,
        |  CAST(least(bin * 1000 + 1000, e.csize) AS INT) AS "end",
        |  CAST(0 AS INT) AS total_items,
        |  CAST(100 * k AS INT) AS bases_covered,
        |  CAST(mx AS DOUBLE) AS max_value, CAST(mn AS DOUBLE) AS min_value,
        |  CAST(sq * 100 AS DOUBLE) AS sum_squares,
        |  CAST(sm * 100 AS DOUBLE) AS sum
        |FROM b JOIN ext e USING (name) ORDER BY b.name, start""".stripMargin,

    "f51_assembly_stats" ->
      """WITH lens AS (SELECT CAST(length(replace(text, ' ', ''))
        |    AS BIGINT) AS l FROM documents),
        |tot AS (SELECT count(*) AS n_contigs, sum(l) AS total_len,
        |  max(l) AS max_len FROM lens),
        |cum AS (SELECT l, sum(l * c) OVER (ORDER BY l DESC
        |    ROWS UNBOUNDED PRECEDING) AS cw
        |  FROM (SELECT l, count(*) AS c FROM lens GROUP BY l)),
        |n50 AS (SELECT max(l) AS n50 FROM cum, tot WHERE cw * 2 >= total_len),
        |n90 AS (SELECT max(l) AS n90 FROM cum, tot
        |  WHERE cw * 10 >= total_len * 9)
        |SELECT n_contigs, CAST(total_len AS BIGINT) AS total_len, max_len,
        |  n50, n90 FROM tot, n50, n90""".stripMargin,

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
        |  '0,0,0,0,0,0,0,0,0,0' AS quality_score""".stripMargin,

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

    "f29_fastq_roundtrip" ->
      """SELECT * FROM (VALUES
        |  ('SEQ_ID', 'This is a description',
        |   'GATTTGGGGTExonAAGCAGTATCGAExonAATAGTAAATCCATTTGTExonACExonCAGTTT',
        |   '!''''*((((***+))%%%++)(%%%%).1***-+*''''))**55CCF>>>>>>CCCCCCC65'),
        |  ('SEQ_ID2', NULL,
        |   'GATTTGGGGTExonAAGCAGTATCGAExonAATAGTAAATCCATTTGTExonACExonCAGTTT',
        |   '!''''*((((***+))%%%++)(%%%%).1***-+*''''))**55CCF>>>>>>CCCCCCC65')
        |) t(name, description, sequence, quality_scores)
        |ORDER BY name""".stripMargin,

    "f30_sql_table_functions" ->
      """SELECT CAST(2 AS BIGINT) AS n_fasta, CAST(2 AS BIGINT) AS n_fastq,
        |  CAST(61 AS BIGINT) AS n_bam, CAST(82 AS BIGINT) AS n_vcf_region,
        |  CAST(8813 AS BIGINT) AS n_gff_region,
        |  CAST(10000109 AS BIGINT) AS max_bcf_pos,
        |  CAST(1 AS BIGINT) AS n_fasta_region,
        |  CAST(6 AS BIGINT) AS n_bw, CAST(1 AS BIGINT) AS n_bw_region,
        |  CAST(2 AS BIGINT) AS n_bw_zoom""".stripMargin,

    "f31_fasta_fai_seek" ->
      """SELECT * FROM (VALUES
        |  ('chrA:1999997-2000000', CAST(NULL AS VARCHAR), 'ACGT'),
        |  ('chrA:59-62', CAST(NULL AS VARCHAR), 'GTAC'),
        |  ('chrB:1000001-1000016', CAST(NULL AS VARCHAR), 'ACGTACGTACGTACGT'))
        |t(id, description, sequence) ORDER BY id""".stripMargin,

    "f32_cram_crai_region" ->
      """SELECT CAST(10 AS BIGINT) AS n_chr2, CAST(20 AS BIGINT) AS n_interval,
        |  CAST(910 AS BIGINT) AS n_all""".stripMargin,

    "f33_bzip2_xz" ->
      """SELECT CAST(2 AS BIGINT) AS n_bz2, CAST(8 AS BIGINT) AS len_bz2,
        |  CAST(2 AS BIGINT) AS n_xz, CAST(8 AS BIGINT) AS len_xz""".stripMargin,

    "f36_gff_write_indexed" ->
      """SELECT CAST(96556 AS BIGINT) AS n_all, CAST(24 AS BIGINT) AS n_chroms,
        |  CAST(8813 AS BIGINT) AS n_chr1""".stripMargin,

    // sum_{i=0..7} (100 + i) = 828
    "f37_fasta_count_pushdown" ->
      "SELECT CAST(828 AS BIGINT) AS n",

    // 61 mapped + 0 unmapped + 0 no-coor in the fixture's .bai (= f19/f30's
    // full-scan count)
    "f39_bam_count_pushdown" ->
      "SELECT CAST(61 AS BIGINT) AS n",

    // fixture constants: 61 records total (f19), 7 in chr1:1-12209145 (f20),
    // zero row-level diff after the sink round trip, metadata count = total
    "f40_bam_write_indexed" ->
      """SELECT CAST(61 AS BIGINT) AS n_full, CAST(0 AS BIGINT) AS n_diff,
        |  CAST(7 AS BIGINT) AS n_region, CAST(61 AS BIGINT) AS n_meta""".stripMargin,

    // 61 fixture records, 4636 bases reconstructed without a reference,
    // zero row diffs vs the htslib-produced BAM original
    "f41_cram_write_roundtrip" ->
      """SELECT CAST(61 AS BIGINT) AS n_full, CAST(4636 AS BIGINT) AS sum_seq,
        |  CAST(0 AS BIGINT) AS n_diff""".stripMargin,

    "f42_cram_bcf_tvf" ->
      """SELECT CAST(910 AS BIGINT) AS n_cram, CAST(10 AS BIGINT) AS n_cram_chr2,
        |  CAST(20 AS BIGINT) AS n_cram_interval,
        |  CAST(191 AS BIGINT) AS n_bcf_chr1""".stripMargin,

    // 1000 synthesized alignments; chr1:1-3000 overlaps starts 1..2991 =
    // ids 0..299
    "f43_sam_write_indexed" ->
      """SELECT CAST(1000 AS BIGINT) AS n_full, CAST(0 AS BIGINT) AS n_diff,
        |  CAST(300 AS BIGINT) AS n_region""".stripMargin,

    // 10 fixture records; one overlaps chr1:11874-12300
    "f44_bed_write_indexed" ->
      """SELECT CAST(10 AS BIGINT) AS n_full, CAST(0 AS BIGINT) AS n_diff,
        |  CAST(1 AS BIGINT) AS n_region""".stripMargin,

    // 77 fixture records; 10 overlap chr1:12000-12999
    "f45_gtf_write_indexed" ->
      """SELECT CAST(77 AS BIGINT) AS n_full, CAST(0 AS BIGINT) AS n_diff,
        |  CAST(10 AS BIGINT) AS n_region""".stripMargin,

    // 40 sequences of 4*(id%5+3) bases = 800 total; s7 = "ACGT"*5, bases
    // 3..10 = GTACGTAC
    "f46_fasta_write_fai" ->
      """SELECT CAST(40 AS BIGINT) AS n_full, CAST(800 AS BIGINT) AS sum_len,
        |  'GTACGTAC' AS sub""".stripMargin,

    // chr1=8813 + chr2=7223 = 16036; chr1∩[100000,200000]=4 + chr2 = 7227
    "f47_multi_region_where" ->
      "SELECT CAST(16036 AS BIGINT) AS n_in, CAST(7227 AS BIGINT) AS n_or",

    // tools/pin_f48.py — independent raw-text parse of both fixtures
    "f48_variant_annotation" ->
      """SELECT * FROM (VALUES
        |  ('chr1', CAST(3000150 AS BIGINT), 'C', CAST(1 AS BIGINT), CAST(22733 AS BIGINT), CAST(3022883 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3000151 AS BIGINT), 'C', CAST(1 AS BIGINT), CAST(22732 AS BIGINT), CAST(3022883 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3062915 AS BIGINT), 'G', CAST(1 AS BIGINT), CAST(1157 AS BIGINT), CAST(3064072 AS BIGINT), 'polyA_site'),
        |  ('chr1', CAST(3062915 AS BIGINT), 'GTTT', CAST(1 AS BIGINT), CAST(1157 AS BIGINT), CAST(3064072 AS BIGINT), 'polyA_site'),
        |  ('chr1', CAST(3106154 AS BIGINT), 'C', CAST(1 AS BIGINT), CAST(42056 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3106154 AS BIGINT), 'CAAA', CAST(1 AS BIGINT), CAST(42056 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3157410 AS BIGINT), 'GA', CAST(1 AS BIGINT), CAST(93312 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3162006 AS BIGINT), 'GAA', CAST(1 AS BIGINT), CAST(97908 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3177144 AS BIGINT), 'G', CAST(2 AS BIGINT), CAST(113046 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr1', CAST(3184885 AS BIGINT), 'TAAAA', CAST(1 AS BIGINT), CAST(120787 AS BIGINT), CAST(3064093 AS BIGINT), 'polyA_signal'),
        |  ('chr2', CAST(3199812 AS BIGINT), 'G', CAST(1 AS BIGINT), CAST(10821 AS BIGINT), CAST(3188986 AS BIGINT), 'polyA_signal'),
        |  ('chr3', CAST(3212016 AS BIGINT), 'CTT', CAST(1 AS BIGINT), CAST(44564 AS BIGINT), CAST(3167447 AS BIGINT), 'polyA_signal'),
        |  ('chr4', CAST(3258448 AS BIGINT), 'TACACACAC', CAST(1 AS BIGINT), CAST(1836 AS BIGINT), CAST(3256611 AS BIGINT), 'polyA_site'),
        |  ('chr4', CAST(3258501 AS BIGINT), 'C', CAST(1 AS BIGINT), CAST(1889 AS BIGINT), CAST(3256611 AS BIGINT), 'polyA_site'))
        |t(seqname, pos, ref, n_var, dist, f_start, f_type)
        |ORDER BY pos, ref""".stripMargin,

    // tools/pin_f49.py — independent binary BAM parse + exact sweep line
    "f49_bam_depth" ->
      """SELECT * FROM (VALUES
        |  ('chr1', CAST(61 AS BIGINT), CAST(13470 AS BIGINT), CAST(61 AS BIGINT), CAST(17764 AS BIGINT)))
        |t(reference, n_reads, covered_bases, max_depth, sum_depth)
        |ORDER BY reference""".stripMargin,

    // hand-derived from the fixture quality string (see query comment)
    "f50_fastq_trim" ->
      """SELECT CAST(2 AS BIGINT) AS n_reads, CAST(128 AS BIGINT) AS sum_len,
        |  CAST(116 AS BIGINT) AS sum_trimmed,
        |  CAST(0 AS BIGINT) AS n_dropped""".stripMargin,

    "f38_gff_dirty_attrs" ->
      """SELECT * FROM (VALUES
        |  ('chr1', CAST(10 AS BIGINT), 'ID', 'g;1'),
        |  ('chr1', CAST(10 AS BIGINT), 'Note', 'a=b|c,d'),
        |  ('chr1', CAST(30 AS BIGINT), 'Desc',
        |     'tab' || chr(9) || 'here|line' || chr(10) || 'break'),
        |  ('chr1', CAST(30 AS BIGINT), 'ID', 'm%1'),
        |  ('chr2', CAST(5 AS BIGINT), 'Name', '100%,done;ok=yes'))
        |t(seqname, start, "key", "value")
        |ORDER BY seqname, start, "key" """.stripMargin,

    // same generated table re-derived arithmetically: the sink+reader pair
    // must reproduce exactly what the generator describes
    "f35_vcf_write_indexed" ->
      """WITH rows AS (
        |  SELECT 'chr' || CAST(i // 10000 AS VARCHAR) AS chrom,
        |         (i % 10000) * 150 + 1 AS pos,
        |         CAST(i % 60 AS DOUBLE) AS qual
        |  FROM generate_series(0, 39999) t(i))
        |SELECT (SELECT count(*) FROM rows) AS n_full,
        |  (SELECT CAST(sum(pos) AS BIGINT) FROM rows) AS sum_pos,
        |  (SELECT count(*) FROM rows
        |    WHERE chrom = 'chr2' AND pos BETWEEN 300000 AND 330000) AS n_region,
        |  (SELECT CAST(sum(qual) AS BIGINT) FROM rows
        |    WHERE chrom = 'chr2' AND pos BETWEEN 300000 AND 330000) AS sum_qual""".stripMargin,

    "f34_fasta_integer" ->
      """SELECT * FROM (VALUES
        |  ('dna', 'a', '1,4,2,3'),
        |  ('dna', 'b', '1,4,2,3'),
        |  ('protein', 'a', '1,3,4,5,6,7,8,9,10,11,12,13,15,16,17,18,19,21,22,23'),
        |  ('protein', 'b', '1,3,4,5,6,7,8,9,10,11,12,13,15,16,17,18,19,21,22,23'))
        |t(kind, id, codes) ORDER BY kind, id""".stripMargin,

    "f13_gff_indexed_region" ->
      """SELECT CAST(8813 AS BIGINT) AS n_chr1, CAST(7223 AS BIGINT) AS n_chr2,
        |  CAST(0 AS BIGINT) AS n_none, CAST(8813 AS BIGINT) AS n_where""".stripMargin,

    "f14_vcf_indexed_region" ->
      "SELECT CAST(82 AS BIGINT) AS n_narrow, CAST(191 AS BIGINT) AS n_chr1",

    "f15_sdf_scan" ->
      """SELECT CAST(6512 AS BIGINT) AS n, CAST(111067 AS BIGINT) AS sum_atoms,
        |  CAST(118197 AS BIGINT) AS sum_bonds, 'SciTegic02060916132D' AS header,
        |  50 AS atom_count, 60 AS bond_count""".stripMargin,

    "f16_genbank_scan" ->
      """SELECT 'BGC0002746' AS name, 'BGC0002746' AS accession, 'CON' AS division,
        |  'linear' AS topology, 'DNA' AS molecule_type,
        |  38658 AS seq_len, 53 AS n_features""".stripMargin,

    "f17_mzml_scan" ->
      "SELECT CAST(2 AS BIGINT) AS n, CAST(2 AS BIGINT) AS n_peak",

    "f18_fcs_scan" ->
      """SELECT * FROM (VALUES
        |  (CAST(1.5 AS REAL), CAST(2.5 AS REAL), CAST(3.5 AS REAL)),
        |  (CAST(4.0 AS REAL), CAST(5.0 AS REAL), CAST(6.0 AS REAL)))
        |t(fsc, ssc, fl1) ORDER BY fsc""".stripMargin,

    "f19_bam_scan" ->
      """SELECT CAST(61 AS BIGINT) AS n, CAST(122 AS BIGINT) AS n_part,
        |  'READ_ID' AS name, 83 AS flag, 'chr1' AS reference,
        |  CAST(12203704 AS BIGINT) AS start, CAST(12217173 AS BIGINT) AS "end",
        |  '55M13394N21M' AS cigar""".stripMargin,

    "f20_bam_indexed_region" ->
      "SELECT CAST(7 AS BIGINT) AS n_region, CAST(14 AS BIGINT) AS n_region_part",

    "f21_bcf_scan" ->
      """SELECT CAST(621 AS BIGINT) AS n, CAST(191 AS BIGINT) AS n_chr1,
        |  CAST(0 AS BIGINT) AS n_diff""".stripMargin,

    "f22_bigwig_value" ->
      """SELECT * FROM (VALUES
        |  ('1', 0, 1, CAST(0.1 AS REAL)), ('1', 1, 2, CAST(0.2 AS REAL)),
        |  ('1', 2, 3, CAST(0.3 AS REAL)), ('1', 100, 150, CAST(1.4 AS REAL)),
        |  ('1', 150, 151, CAST(1.5 AS REAL)), ('10', 200, 300, CAST(2.0 AS REAL)))
        |t(name, start, "end", value) ORDER BY name, start""".stripMargin,

    "f54_bigwig_indexed_region" ->
      """SELECT * FROM (VALUES
        |  ('1', 100, 150, CAST(1.4 AS REAL)),
        |  ('10', 200, 300, CAST(2.0 AS REAL)))
        |t(name, start, "end", value) ORDER BY name, start""".stripMargin,

    "f24_fasta_indexed" ->
      """SELECT * FROM (VALUES
        |  ('a:1-2', CAST(NULL AS VARCHAR), 'AT'),
        |  ('a:3-4', CAST(NULL AS VARCHAR), 'CG'),
        |  ('a:3-4', CAST(NULL AS VARCHAR), 'CG'))
        |t(id, description, sequence) ORDER BY id, sequence""".stripMargin,

    "f25_inferred_format" ->
      """SELECT CAST(2 AS BIGINT) AS n_fastq, CAST(621 AS BIGINT) AS n_vcf,
        |  CAST(61 AS BIGINT) AS n_bam""".stripMargin,

    "f26_vcf_typed" ->
      """SELECT 1 AS dp, CAST(0.0 AS REAL) AS mq0f, CAST(26.0 AS REAL) AS i16_5,
        |  '0/0' AS gt, 26 AS pl_3""".stripMargin,

    "f27_sam_typed_tags" ->
      """SELECT 'Hello world!' AS za, 'grp1' AS rg, CAST(255 AS BIGINT) AS bb_3,
        |  0 AS nm, CAST(3.14159 AS REAL) AS fa""".stripMargin,

    "f28_cram_scan" ->
      """SELECT 'r000' AS name, 99 AS flag, 'insert' AS reference,
        |  CAST(50 AS BIGINT) AS start, CAST(59 AS BIGINT) AS "end",
        |  '30' AS mapping_quality, '10M' AS cigar, 'insert' AS mate_reference,
        |  CAST(15 AS BIGINT) AS n, CAST(4 AS BIGINT) AS n_two,
        |  CAST(910 AS BIGINT) AS n_multi""".stripMargin,

    "f23_bigwig_zoom" ->
      """SELECT name, start, "end", total_items, bases_covered,
        |  CAST(max_v AS DOUBLE) AS max_v, CAST(min_v AS DOUBLE) AS min_v,
        |  CAST(sum_sq AS DOUBLE) AS sum_sq, CAST(sum_v AS DOUBLE) AS sum_v
        |FROM (VALUES
        |  ('1', 0, 400, 0, 54, 1.5, 0.1, 100.39, 72.1),
        |  ('10', 200, 600, 0, 100, 2.0, 2.0, 400.0, 200.0))
        |t(name, start, "end", total_items, bases_covered, max_v, min_v, sum_sq, sum_v)
        |ORDER BY name""".stripMargin
  )
}
