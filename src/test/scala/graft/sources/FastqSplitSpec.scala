package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Validated FASTQ record-resync splits (FastqFormat.validateWindow +
  * windowRecords) and index-free bgzipped FASTA resync splits: both formats
  * must fan out over parallel chunks with rows invariant to the chunking.
  * The FASTQ corpus is ADVERSARIAL: a third of the quality lines start with
  * '@' (legal Phred 31), which is exactly the ambiguity the chained
  * validation must reject — a '@'-quality line is never followed by a pure
  * sequence line, the next record's header is.
  */
class FastqSplitSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** 120k records, variable-length md5-derived sequences (24..87 bases),
    * quality lines starting with '@' every third record, descriptions on
    * every fifth. One uncompressed file + one BGZF copy (no index).
    */
  private lazy val (fqPath, fqGzPath): (String, String) = {
    val dir = graft.TestTmp.dir("fastq_split").toFile
    val f = new java.io.File(dir, "reads.fastq")
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder(1 << 20)
    val out = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    (0 until 120000).foreach { i =>
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
      sb.append('@').append("r").append(i)
      if (i % 5 == 0) sb.append(" desc").append(i)
      sb.append('\n').append(seq).append('\n').append('+').append('\n')
        .append(qual).append('\n')
      out.write(sb.toString)
    }
    out.close()
    // BGZF copy (the bgzipped landing shape, no index sibling)
    val gz = new java.io.File(dir, "reads.fastq.gz")
    val fos = new java.io.FileOutputStream(gz)
    val w = new BgzfWriter(new java.io.BufferedOutputStream(fos, 1 << 16))
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16)
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r > 0) { w.write(buf, 0, r); r = in.read(buf) }
    in.close(); w.finish(); fos.close()
    (f.getAbsolutePath, gz.getAbsolutePath)
  }

  private def assertSameRows(split: DataFrame, whole: DataFrame): Unit = {
    assert(split.count() == whole.count())
    assert(split.except(whole).count() == 0, "split scan produced extra/changed rows")
    assert(whole.except(split).count() == 0, "split scan dropped rows")
  }

  test("uncompressed fastq splits with validated alignment; rows invariant") {
    val whole = spark.read.format("fastq").load(fqPath)
    assert(whole.count() == 120000L)
    for (sz <- Seq("131072", "524288", "999999")) {
      withConf("spark.sql.files.maxPartitionBytes" -> sz,
               "spark.sql.files.openCostInBytes" -> "1024") {
        val split = spark.read.format("fastq").load(fqPath)
        assert(split.rdd.getNumPartitions > 1, s"no split at maxPartitionBytes=$sz")
        assertSameRows(split, whole)
      }
    }
  }

  test("bgzipped fastq (no index) splits via record resync; rows invariant") {
    val whole = spark.read.format("fastq").load(fqGzPath)
    assert(whole.rdd.getNumPartitions >= 1)
    assert(whole.count() == 120000L)
    // 16 KiB cuts land many chunks interior to one BGZF block (the
    // hasOwned=false path); the larger sizes exercise unaligned bounds
    for (sz <- Seq("16384", "262144", "1048576")) {
      withConf("spark.sql.files.maxPartitionBytes" -> sz,
               "spark.sql.files.openCostInBytes" -> "1024") {
        val split = spark.read.format("fastq").load(fqGzPath)
        assert(split.rdd.getNumPartitions > 1, s"no resync split at $sz")
        assertSameRows(split, whole)
      }
    }
  }

  test("plain-gzip fastq stays one task (not BGZF, nothing to resync)") {
    val dir = graft.TestTmp.dir("fastq_plaingz").toFile
    val gz = new java.io.File(dir, "reads.fastq.gz")
    val os = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    val in = new java.io.FileInputStream(fqPath)
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r > 0) { os.write(buf, 0, r); r = in.read(buf) }
    in.close(); os.close()
    withConf("spark.sql.files.maxPartitionBytes" -> "262144",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val df = spark.read.format("fastq").load(gz.getAbsolutePath)
      assert(df.rdd.getNumPartitions == 1)
      assert(df.count() == 120000L)
    }
  }

  test("validator finds exactly the true record starts, incl. '@' quality lines") {
    // walk the raw file: true record starts are every 4th line start
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fqPath))
    val lineStarts = scala.collection.mutable.ArrayBuffer[Int](0)
    bytes.zipWithIndex.foreach { case (b, i) =>
      if (b == '\n' && i + 1 < bytes.length) lineStarts += i + 1
    }
    val trueStarts = lineStarts.zipWithIndex.collect {
      case (off, k) if k % 4 == 0 => off.toLong
    }.toSet
    // from a sample of line starts, the first validating line must be the
    // next true record start — '@' quality lines must all be rejected
    val rnd = new scala.util.Random(11)
    (0 until 60).foreach { _ =>
      val k0 = rnd.nextInt(lineStarts.length - 16)
      var k = k0
      def windowAt(k: Int): graft.sources.formats.LineWindow = {
        val in = new java.io.ByteArrayInputStream(bytes, lineStarts(k),
          bytes.length - lineStarts(k))
        new graft.sources.formats.LineWindow(new ByteLineReader(in, lineStarts(k).toLong))
      }
      while (!graft.sources.formats.FastqFormat.validateWindow(windowAt(k))) k += 1
      val expected = (k0 until k0 + 8).find(_ % 4 == 0).get
      assert(k == expected,
        s"from line $k0 validator picked line $k, true next record line $expected")
    }
  }

  /** Bgzipped many-record FASTA with NO .fai/.gzi: the '>'-resync split. */
  test("bgzipped unindexed fasta splits via record resync; rows invariant") {
    val dir = graft.TestTmp.dir("fasta_resync").toFile
    val gz = new java.io.File(dir, "seqs.fasta.gz")
    val fos = new java.io.FileOutputStream(gz)
    val w = new BgzfWriter(new java.io.BufferedOutputStream(fos, 1 << 16))
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 100000).foreach { i =>
      md.reset()
      val h = md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val seq = (h * 2).take(30 + i % 50).toUpperCase
        .map(c => "ACGT"((c % 4 + 4) % 4))
      w.write(s">s$i d$i\n$seq\n".getBytes("UTF-8"))
    }
    w.finish(); fos.close()
    val whole = spark.read.format("fasta").load(gz.getAbsolutePath)
    assert(whole.count() == 100000L)
    for (sz <- Seq("262144", "1048576")) {
      withConf("spark.sql.files.maxPartitionBytes" -> sz,
               "spark.sql.files.openCostInBytes" -> "16384") {
        val split = spark.read.format("fasta").load(gz.getAbsolutePath)
        assert(split.rdd.getNumPartitions > 1, s"no fasta resync split at $sz")
        assertSameRows(split, whole)
      }
    }
  }
}
