package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SharedSpark
import graft.tools.MiniS3

/** Object-store arm for the index-free split families that BamResyncSpec /
  * BgzfBlockSplitSpec / FastqSplitSpec prove on local disk only: unindexed
  * BAM (binary record resync), unindexed bgzipped VCF (BGZF block split +
  * line alignment) and bgzipped FASTQ (validated 4-line resync). A 300 GB
  * landing-zone file lives on an object store, where the access pattern —
  * not just the row result — must be sane: each split task should cost a
  * constant handful of ranged GETs (open at the cut + one header reopen),
  * never one GET per BGZF block or a full restart from byte 0.
  *
  * Pinned on the wire through the from-scratch S3 FileSystem against the
  * in-process MiniS3: split engagement (>= 3 partitions), exact row parity
  * with the local scan, GET count bounded by a small multiple of the
  * partition count (far under the file's BGZF block count), and ranged
  * seeks (non-zero Range offsets on the cut opens).
  */
class S3ResyncSweepSpec extends AnyFunSuite with SharedSpark {

  // --- fixtures (built once, on local disk, then uploaded) ---------------

  /** One-shard sorted BAM via the engine's own sink, .bai deleted. */
  private lazy val bamFile: java.io.File = {
    val dir = graft.TestTmp.dir("s3_resync_bam").toString + "/t"
    val n = 30000L
    val refs = (0 until 4).map(i => s"chr$i:40000000").mkString(",")
    spark.range(0, n).select(
        concat(lit("r"), col("id")).as("name"),
        lit(0).as("flag"),
        concat(lit("chr"), (col("id") % 4).cast("string")).as("reference"),
        ((col("id") / 4).cast("long") * 150 + 1).as("start"),
        ((col("id") / 4).cast("long") * 150 + 100).as("end"),
        lit("30").as("mapping_quality"),
        lit("100M").as("cigar"),
        lit(null).cast("string").as("mate_reference"),
        translate(substring(concat(md5(col("id").cast("string")),
            md5((col("id") + n).cast("string")),
            md5((col("id") + 2 * n).cast("string")),
            md5((col("id") + 3 * n).cast("string"))), 1, 100),
          "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
        array_repeat(lit(30L), 100).as("quality_score"),
        array().cast("array<struct<tag:string,value:string>>").as("tags"))
      .repartitionByRange(1, col("reference"), col("start"))
      .sortWithinPartitions("reference", "start")
      .write.format("bam").mode("overwrite").option("refs", refs).save(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bai")).foreach(f => assert(f.delete()))
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bam"))
      .minBy(_.getName)
  }

  /** One unindexed bgzipped VCF (the shared landing-zone corpus shape). */
  private lazy val vcfGzFile: java.io.File = {
    val dir = graft.TestTmp.dir("s3_resync_vcfgz").toString
    graft.tools.Corpora.writeUnindexedVcfGz(spark, dir, 120000L)
    new java.io.File(dir, "calls.vcf.gz")
  }

  /** Bgzipped FASTQ, no index: 50k variable-length records through the
    * BgzfWriter, a third of quality lines starting with '@' (the resync
    * validator's adversarial case).
    */
  private lazy val fastqGzFile: java.io.File = {
    val dir = graft.TestTmp.dir("s3_resync_fastqgz").toFile
    val gz = new java.io.File(dir, "reads.fastq.gz")
    val md = java.security.MessageDigest.getInstance("MD5")
    val fos = new java.io.FileOutputStream(gz)
    val w = new BgzfWriter(new java.io.BufferedOutputStream(fos, 1 << 16))
    val sb = new StringBuilder(1 << 16)
    (0 until 50000).foreach { i =>
      md.reset()
      val h = md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val len = 24 + (h.take(4).hashCode.abs % 64)
      val seq = (h * 3).take(len).map {
        case c if c <= '3' => 'A'
        case c if c <= '7' => 'C'
        case c if c <= 'b' => 'G'
        case _ => 'T'
      }
      val qual0 = (h.reverse * 3).take(len).map(c => ('!' + (c % 40)).toChar)
      val qual = if (i % 3 == 0) "@" + qual0.drop(1) else qual0
      sb.setLength(0)
      sb.append('@').append("r").append(i).append('\n')
        .append(seq).append('\n').append('+').append('\n')
        .append(qual).append('\n')
      w.write(sb.toString.getBytes("UTF-8"))
    }
    w.finish(); fos.close()
    gz
  }

  // --- harness -----------------------------------------------------------

  /** The fs.s3.* keys are GLOBAL (shared SparkSession hadoopConfiguration)
    * — save/restore them so this suite cannot leave a later suite pointed
    * at a stopped MiniS3 port.
    */
  private def withS3(f: MiniS3 => Unit): Unit = {
    val s3 = new MiniS3().start()
    val conf = spark.sparkContext.hadoopConfiguration
    val keys = Seq("fs.s3.impl", "fs.s3.endpoint", "fs.s3.impl.disable.cache")
    val saved = keys.map(k => k -> Option(conf.get(k)))
    conf.set("fs.s3.impl", classOf[graft.sources.s3.S3HttpFileSystem].getName)
    conf.set("fs.s3.endpoint", s3.endpoint)
    conf.set("fs.s3.impl.disable.cache", "true")
    try f(s3) finally {
      s3.stop()
      saved.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
      }
    }
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** Upload `file`, scan it split through S3, and pin: engagement, row
    * parity with the local scan, bounded ranged GETs.
    */
  private def sweepCase(name: String, file: java.io.File, fmt: String,
                        splitBytes: Long, project: DataFrame => DataFrame): Unit =
    withS3 { s3 =>
      s3.put("graft-resync", s"$name/${file.getName}",
        java.nio.file.Files.readAllBytes(file.toPath))
      withConf(
        "spark.sql.files.maxPartitionBytes" -> splitBytes.toString,
        "spark.sql.files.openCostInBytes" -> splitBytes.toString) {
        val local = project(spark.read.format(fmt).load(file.getAbsolutePath))
        val viaS3 = project(spark.read.format(fmt)
          .load(s"s3://graft-resync/$name/${file.getName}"))
        val parts = viaS3.rdd.getNumPartitions
        assert(parts >= 3,
          s"$name: index-free split did not engage over S3 ($parts partition(s), " +
            s"file ${file.length()} B, split $splitBytes B)")
        import scala.jdk.CollectionConverters._
        s3.requests.clear() // drop planning/listing traffic; pin the scan
        val n = viaS3.count()
        val gets = s3.requests.asScala
          .filter(r => r._1 == "GET" && r._2.endsWith(file.getName)).toSeq
        // ~2 GETs/task (cut open + header reopen) with slack for retries;
        // a per-block or per-record access pattern would blow far past this
        val bound = 6 * parts + 6
        assert(gets.size <= bound,
          s"$name: split scan issued ${gets.size} GETs for $parts partitions " +
            s"(bound $bound) — per-block/per-record access pattern?")
        val offsets = gets.flatMap(_._3).map { h =>
          h.stripPrefix("bytes=").takeWhile(_ != '-').toLong
        }
        assert(offsets.count(_ > 0) >= parts - 1,
          s"$name: expected >=${parts - 1} ranged (non-zero offset) cut seeks, " +
            s"saw offsets $offsets")
        assert(n == local.count(), s"$name: S3 row count differs from local")
        assert(viaS3.except(local).count() == 0 &&
            local.except(viaS3).count() == 0,
          s"$name: S3 split rows differ from local")
      }
    }

  // --- the three families ------------------------------------------------

  test("unindexed BAM record-resync split over S3: bounded ranged GETs, exact rows") {
    sweepCase("bam", bamFile, "bam", 524288L,
      _.select("name", "reference", "start", "cigar"))
  }

  test("unindexed bgzipped VCF block split over S3: bounded ranged GETs, exact rows") {
    sweepCase("vcf", vcfGzFile, "vcf", 262144L,
      _.select("chrom", "pos", "ref", "info"))
  }

  test("bgzipped FASTQ 4-line resync split over S3: bounded ranged GETs, exact rows") {
    sweepCase("fastq", fastqGzFile, "fastq", 262144L,
      _.select("name", "sequence", "quality_scores"))
  }
}
