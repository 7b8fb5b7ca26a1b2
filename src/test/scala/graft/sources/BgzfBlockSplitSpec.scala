package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Index-FREE BGZF splits (GraftScan.bgzfBlockSplitChunks): a big bgzipped
  * one-line-per-record text file with NO tabix sibling — the common
  * landing-zone shape — must fan out over parallel chunks via validated
  * block-boundary scans + Hadoop line alignment, and the result must be
  * invariant to the chunking. Plain (non-BGZF) gzip must stay one task.
  */
class BgzfBlockSplitSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private val splitConf = Seq(
    "spark.sql.files.maxPartitionBytes" -> "131072",
    "spark.sql.files.openCostInBytes" -> "16384")

  /** A single bgzipped VCF part with its .tbi sibling REMOVED. */
  private lazy val gzOnlyDir: String = {
    val sink = graft.TestTmp.dir("blocksplit_sink").toString + "/t"
    val n = 40000L
    spark.range(0, 3 * n).select(
        concat(lit("chr"), (col("id") / n).cast("long").cast("string")).as("chrom"),
        ((col("id") % n) * 200 + 1).as("pos"),
        lit(null).cast("array<string>").as("id"),
        lit("A").as("ref"),
        array(lit("T")).as("alt"),
        lit(30f).as("qual"),
        lit(null).cast("array<string>").as("filter"),
        concat(lit("DP="), (col("id") % 100).cast("string")).as("info"),
        lit(null).cast("string").as("formats"))
      .repartitionByRange(1, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .write.format("vcf").mode("overwrite").option("compression", "bgzf").save(sink)
    val dir = graft.TestTmp.dir("blocksplit_noidx")
    new java.io.File(sink).listFiles()
      .filter(_.getName.endsWith(".vcf.gz")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dir.toFile, f.getName).toPath)
      }
    dir.toString
  }

  private def assertSameRows(split: DataFrame, whole: DataFrame): Unit = {
    assert(split.count() == whole.count())
    assert(split.except(whole).count() == 0, "split scan produced extra/changed rows")
    assert(whole.except(split).count() == 0, "split scan dropped rows")
  }

  test("unindexed vcf.gz splits into parallel chunks; rows invariant") {
    val whole = spark.read.format("vcf").load(gzOnlyDir)
      .select("chrom", "pos", "ref", "info")
    assert(whole.rdd.getNumPartitions == 1, "corpus unexpectedly split at default conf")
    withConf(splitConf: _*) {
      val split = spark.read.format("vcf").load(gzOnlyDir)
        .select("chrom", "pos", "ref", "info")
      val parts = split.rdd.getNumPartitions
      assert(parts > 2, s"expected >2 index-free chunk partitions, got $parts")
      assertSameRows(split, whole)
    }
  }

  test("split invariance at a second chunk size") {
    val whole = spark.read.format("vcf").load(gzOnlyDir)
      .select("chrom", "pos", "info")
    withConf("spark.sql.files.maxPartitionBytes" -> "65536",
             "spark.sql.files.openCostInBytes" -> "8192") {
      val split = spark.read.format("vcf").load(gzOnlyDir)
        .select("chrom", "pos", "info")
      assert(split.rdd.getNumPartitions > 4)
      assertSameRows(split, whole)
    }
  }

  test("typed vcf (parseInfo) over the index-free split: same schema-resolved parse") {
    // header with an ##INFO definition so the typed schema resolves; body
    // bgzipped with the repo's BgzfWriter, NO .tbi sibling
    val dir = graft.TestTmp.dir("blocksplit_typed")
    val f = new java.io.File(dir.toFile, "typed.vcf.gz")
    val fos = new java.io.FileOutputStream(f)
    try {
      val w = new BgzfWriter(new java.io.BufferedOutputStream(fos, 1 << 16))
      w.write(("##fileformat=VCFv4.2\n" +
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">\n" +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n").getBytes("UTF-8"))
      (1 to 150000).foreach { i =>
        w.write(s"chr1\t$i\t.\tA\tT\t30\tPASS\tDP=${i % 97}\n".getBytes("UTF-8"))
      }
      w.finish()
    } finally fos.close()
    val whole = spark.read.format("vcf").option("parseInfo", "true")
      .load(dir.toString).select(col("chrom"), col("pos"), col("info.DP").as("dp"))
    assert(whole.rdd.getNumPartitions == 1)
    withConf(splitConf: _*) {
      val split = spark.read.format("vcf").option("parseInfo", "true")
        .load(dir.toString).select(col("chrom"), col("pos"), col("info.DP").as("dp"))
      assert(split.rdd.getNumPartitions > 2)
      assertSameRows(split, whole)
    }
  }

  test("plain gzip (not BGZF) stays one task and still reads correctly") {
    val dir = graft.TestTmp.dir("blocksplit_plaingz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir.toFile, "x.vcf.gz")))
    val sb = new StringBuilder("##fileformat=VCFv4.2\n")
    sb.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    (1 to 200000).foreach(i => sb.append(s"chr1\t$i\t.\tA\tT\t30\tPASS\tDP=$i\n"))
    out.write(sb.toString.getBytes("UTF-8")); out.close()
    withConf(splitConf: _*) {
      val df = spark.read.format("vcf").load(dir.toString)
      assert(df.rdd.getNumPartitions == 1,
        "plain gzip cannot be entered mid-stream and must stay one task")
      assert(df.count() == 200000)
    }
  }

  test("region option without an index: split parallel scan + exact row filter") {
    // no .tbi exists, so the region can't prune chunks — but the scan
    // still fans out via the index-free split and the row-level overlap
    // filter keeps the result exact
    val whole = spark.read.format("vcf").load(gzOnlyDir)
      .filter(col("chrom") === "chr1" &&
        col("pos").between(1000001L, 2000001L))
      .select("chrom", "pos", "info")
    withConf(splitConf: _*) {
      val regioned = spark.read.format("vcf")
        .option("region", "chr1:1000001-2000001").load(gzOnlyDir)
        .select("chrom", "pos", "info")
      assert(regioned.rdd.getNumPartitions > 2,
        "unindexed region read should still scan in parallel chunks")
      assertSameRows(regioned, whole)
    }
  }

  test("stream-level property: any chunking yields every line exactly once") {
    // drive BgzfBlockSplitInputStream directly (plus the reader-side
    // first-line discard) across many cut layouts, including cuts inside
    // blocks, at block boundaries, and tiny chunks smaller than one block
    val gz = new java.io.File(gzOnlyDir).listFiles()
      .filter(_.getName.endsWith(".vcf.gz")).head
    val p = new org.apache.hadoop.fs.Path(gz.getAbsolutePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val size = gz.length()
    def linesOf(cStart: Long, cEnd: Long): Seq[String] = {
      val in = new BgzfBlockSplitInputStream(fs.open(p), cStart, cEnd, size)
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      try {
        var out = List.newBuilder[String]
        if (cStart > 0) r.readLine() // reader-side discard convention
        var l = r.readLine()
        while (l != null) { out += l; l = r.readLine() }
        out.result()
      } finally r.close()
    }
    val whole = linesOf(0L, size)
    assert(whole.size > 100000) // header lines + 120k records
    // deterministic pseudo-random chunk sizes (no Date/Random seeds needed)
    Seq(7919L, 23456L, 65536L, 100003L, size / 3, size / 7).foreach { step =>
      val cuts = (0L until size by math.max(1024L, step)) :+ size
      val got = cuts.sliding(2).flatMap { w => linesOf(w(0), w(1)) }.toSeq
      assert(got.size == whole.size,
        s"step $step: ${got.size} lines vs ${whole.size}")
      assert(got == whole, s"step $step: line sequence diverged")
    }
  }

  test("findBlockAtOrAfter lands on true block boundaries from arbitrary offsets") {
    val gz = new java.io.File(gzOnlyDir).listFiles()
      .filter(_.getName.endsWith(".vcf.gz")).head
    val p = new org.apache.hadoop.fs.Path(gz.getAbsolutePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val size = gz.length()
    // ground truth: chain block offsets by reading headers from 0
    val truth = scala.collection.mutable.ArrayBuffer[Long]()
    val in = fs.open(p)
    try {
      var off = 0L
      while (off < size) {
        truth += off
        val b = Bgzf.readBlock(in)
        assert(b != null)
        off += b.compressedSize
      }
    } finally in.close()
    assert(truth.length > 10, s"corpus too small: ${truth.length} blocks")
    val raw = fs.open(p)
    try {
      // probing FROM a boundary returns that boundary; from one byte past,
      // the next one; from the middle of a block, the following boundary
      val ts = truth.toIndexedSeq
      Seq(0, 1, ts.length / 2, ts.length - 2).foreach { i =>
        assert(Bgzf.findBlockAtOrAfter(raw, ts(i), size) == ts(i))
        if (i + 1 < ts.length) {
          assert(Bgzf.findBlockAtOrAfter(raw, ts(i) + 1, size) == ts(i + 1))
          val mid = ts(i) + (ts(i + 1) - ts(i)) / 2
          assert(Bgzf.findBlockAtOrAfter(raw, mid, size) == ts(i + 1))
        }
      }
      // past the last block start: no boundary
      assert(Bgzf.findBlockAtOrAfter(raw, ts.last + 1, size) == -1L ||
        Bgzf.findBlockAtOrAfter(raw, ts.last + 1, size) > ts.last)
    } finally raw.close()
  }
}
