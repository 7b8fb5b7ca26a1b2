package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Record-aligned splits of big uncompressed GenBank flat files: a
  * column-0 `LOCUS ` line is an unambiguous record start (body lines are
  * all indented), so the generic splittable machinery + LOCUS-validated
  * alignment fans a multi-record file out with rows invariant to the
  * chunking — the multi-GB flat-release landing shape, previously one
  * task. Also pins that features/qualifiers spanning a cut stay with
  * their owning record, and that a plain-gzip copy stays one (correct)
  * task.
  */
class GenBankSplitSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** ~6k records with deterministic sequences, features and qualifiers;
    * record k has name SEQk and a (100 + (k%7)*10)-base sequence over
    * 60-char ORIGIN lines.
    */
  private lazy val gbFile: java.io.File = {
    val dir = graft.TestTmp.dir("genbank_split")
    val f = new java.io.File(dir.toFile, "release.gb")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val bases = "acgt" * 32
    (0 until 6000).foreach { k =>
      val n = 100 + (k % 7) * 10
      w.write(f"LOCUS       SEQ$k%d             $n%d bp    DNA     linear   CON 24-APR-2019\n")
      w.write(s"DEFINITION  synthetic record $k for the split spec,\n")
      w.write(s"            continued definition line.\n")
      w.write(f"ACCESSION   A$k%06d\n")
      w.write("FEATURES             Location/Qualifiers\n")
      w.write(s"     gene            1..$n\n")
      w.write(s"""                     /locus_tag="LT$k"\n""")
      w.write("                     /note=\"spans a\n")
      w.write("                     continued qualifier line\"\n")
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
    f
  }

  private def read(path: String): DataFrame =
    spark.read.format("genbank").load(path)
      .select(col("name"), col("accession"), length(col("sequence")).as("slen"),
        size(col("features")).as("nfeat"))

  test("big genbank fans out at record boundaries; rows invariant") {
    val whole = read(gbFile.getAbsolutePath)
    assert(whole.rdd.getNumPartitions == 1, "corpus unexpectedly split at default conf")
    assert(whole.count() == 6000)
    withConf("spark.sql.files.maxPartitionBytes" -> "131072",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val split = read(gbFile.getAbsolutePath)
      val parts = split.rdd.getNumPartitions
      assert(parts >= 4, s"genbank record split did not engage: $parts partition(s)")
      assert(split.count() == 6000)
      assert(split.except(whole).count() == 0 && whole.except(split).count() == 0,
        "split scan produced different rows")
    }
  }

  test("invariance across cut sizes (cuts land mid-record, mid-feature, mid-sequence)") {
    val whole = read(gbFile.getAbsolutePath)
    for (sz <- Seq("32768", "65536", "262144")) {
      withConf("spark.sql.files.maxPartitionBytes" -> sz,
               "spark.sql.files.openCostInBytes" -> "1024") {
        val split = read(gbFile.getAbsolutePath)
        assert(split.except(whole).count() == 0 && whole.except(split).count() == 0,
          s"rows not invariant at maxPartitionBytes=$sz")
      }
    }
  }

  test("split rows parse fully: qualifiers and sequence lengths exact") {
    withConf("spark.sql.files.maxPartitionBytes" -> "65536",
             "spark.sql.files.openCostInBytes" -> "1024") {
      val df = spark.read.format("genbank").load(gbFile.getAbsolutePath)
      val r = df.agg(
        count(lit(1)),
        sum(length(col("sequence"))),
        sum(when(col("features")(0)("qualifiers")(0)("values")
          === concat(lit("LT"), regexp_extract(col("name"), "SEQ(\\d+)", 1)), 1L)
          .otherwise(0L))).head
      assert(r.getLong(0) == 6000)
      // sum over k of 100 + (k%7)*10; 6000 = 857 full cycles of 7 + 1
      val expected = (0 until 6000).map(k => 100 + (k % 7) * 10).sum.toLong
      assert(r.getLong(1) == expected, s"sum_seq_len ${r.getLong(1)} != $expected")
      assert(r.getLong(2) == 6000, "locus_tag qualifiers must survive the split")
    }
  }

  // Real-world LOCUS variants: tab-separated fields and a bare two-token
  // `LOCUS <name>` line. The whole-file '//'-grouping keeps such records;
  // split alignment must too — requiring `LOCUS <name> <len> ...` with
  // spaces silently dropped them only when the split plan engaged.
  test("tab-separated and two-token LOCUS lines survive the split") {
    val dir = graft.TestTmp.dir("genbank_split_locus")
    val f = new java.io.File(dir.toFile, "variants.gb")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val n = 3000
    (0 until n).foreach { k =>
      if (k % 3 == 0) w.write(s"LOCUS\tSEQ$k\t100 bp\tDNA\tlinear\tCON 24-APR-2019\n")
      else if (k % 3 == 1) w.write(s"LOCUS SEQ$k\n") // bare two-token
      else w.write(f"LOCUS       SEQ$k%d             100 bp    DNA     linear   CON 24-APR-2019\n")
      w.write(s"ACCESSION   A$k%06d\n")
      w.write("ORIGIN\n")
      w.write(f"${1}%9d ${"acgt" * 15}\n")
      w.write("//\n")
    }
    w.close()
    val whole = read(f.getAbsolutePath)
    assert(whole.rdd.getNumPartitions == 1)
    assert(whole.count() == n)
    withConf("spark.sql.files.maxPartitionBytes" -> "16384",
             "spark.sql.files.openCostInBytes" -> "1024") {
      val split = read(f.getAbsolutePath)
      assert(split.rdd.getNumPartitions >= 4,
        s"no fan-out: ${split.rdd.getNumPartitions}")
      assert(split.count() == n,
        "LOCUS-variant records dropped by split alignment")
      assert(split.except(whole).count() == 0 && whole.except(split).count() == 0)
    }
  }

  test("plain-gzip copy stays one task, same rows") {
    val gz = new java.io.File(gbFile.getParentFile, "release.gb.gz")
    if (!gz.exists()) {
      val in = java.nio.file.Files.readAllBytes(gbFile.toPath)
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(gz), 1 << 16)
      out.write(in); out.close()
    }
    withConf("spark.sql.files.maxPartitionBytes" -> "65536",
             "spark.sql.files.openCostInBytes" -> "1024") {
      val gzDf = read(gz.getAbsolutePath)
      assert(gzDf.rdd.getNumPartitions == 1,
        "plain gzip cannot be entered mid-stream and must stay one task")
      val whole = read(gbFile.getAbsolutePath)
      assert(gzDf.except(whole).count() == 0 && whole.except(gzDf).count() == 0)
    }
  }
}
