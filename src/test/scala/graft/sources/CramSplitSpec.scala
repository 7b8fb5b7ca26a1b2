package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Index-free CRAM container splits (GraftScan.alignedCutChunks +
  * CramFormat.alignedCutOffsets): a big CRAM full scan must fan out over
  * parallel container-aligned chunks — via the `.crai` sibling's container
  * offsets when one exists, and via a driver-side header-skipping sweep
  * when it doesn't (the landing-zone shape). Rows must be invariant to the
  * chunking: each container is decoded by exactly the chunk owning its
  * start offset.
  */
class CramSplitSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** One-shard sorted CRAM through the engine's own sink (10k records per
    * container -> ~8 data containers), written with its `.crai`. A second
    * copy has the `.crai` removed for the sweep arm.
    */
  private lazy val (cramDir, cramNoIdxDir): (String, String) = {
    val dir = graft.TestTmp.dir("cram_split").toString + "/t"
    val n = 80000L
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
      .write.format("cram").mode("overwrite").option("refs", refs).save(dir)
    // second copy without the .crai: forces the header-skipping sweep
    val ni = graft.TestTmp.dir("cram_split_noidx").toString + "/t"
    new java.io.File(ni).mkdirs()
    new java.io.File(dir).listFiles().foreach { f =>
      if (f.getName.endsWith(".cram")) {
        val t = java.nio.file.Paths.get(ni, f.getName)
        java.nio.file.Files.deleteIfExists(t)
        java.nio.file.Files.copy(f.toPath, t)
      }
    }
    (dir, ni)
  }

  private def assertSameRows(split: DataFrame, whole: DataFrame): Unit = {
    assert(split.count() == whole.count())
    assert(split.except(whole).count() == 0, "split scan produced extra/changed rows")
    assert(whole.except(split).count() == 0, "split scan dropped rows")
  }

  private def read(dir: String): DataFrame =
    spark.read.format("cram").load(dir)
      .select("name", "flag", "reference", "start", "end", "cigar")

  test("cram full scan splits at .crai container offsets; rows invariant") {
    val whole = read(cramDir)
    assert(whole.rdd.getNumPartitions == 1, "corpus unexpectedly split at default conf")
    assert(whole.count() == 80000L)
    withConf("spark.sql.files.maxPartitionBytes" -> "262144",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val split = read(cramDir)
      val parts = split.rdd.getNumPartitions
      assert(parts >= 3, s"expected >=3 aligned chunk partitions, got $parts")
      assertSameRows(split, whole)
    }
  }

  // NOTE: since the task-open resync split landed, the no-.crai planner
  // path is containerResyncSplitChunks by default (CramResyncSplitSpec);
  // the conf-gated sweep fallback is covered there too.
  test("unindexed cram (no .crai) splits index-free (task-open resync)") {
    val whole = read(cramNoIdxDir)
    assert(whole.count() == 80000L)
    withConf("spark.sql.files.maxPartitionBytes" -> "262144",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val split = read(cramNoIdxDir)
      val parts = split.rdd.getNumPartitions
      assert(parts >= 3, s"index-free split did not engage: $parts partition(s)")
      assertSameRows(split, whole)
    }
  }

  test("aligned split invariance across chunk sizes") {
    val whole = read(cramDir)
    for (sz <- Seq("131072", "524288", "1048576")) {
      withConf("spark.sql.files.maxPartitionBytes" -> sz,
               "spark.sql.files.openCostInBytes" -> "1024") {
        assertSameRows(read(cramDir), whole)
      }
    }
  }

  test("region read on a split cram still prunes and filters exactly") {
    withConf("spark.sql.files.maxPartitionBytes" -> "262144",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val got = spark.read.format("cram").option("region", "chr1:1-1501")
        .load(cramDir).count()
      // chr1 rows overlapping [1,1501]: starts 1,151,...,1501
      assert(got == 11, s"expected 11 rows in chr1:1-1501, got $got")
    }
  }

  test("sweep offsets equal the .crai container offsets") {
    val f = new java.io.File(cramDir).listFiles()
      .filter(_.getName.endsWith(".cram")).minBy(_.getName)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration()).getRaw
    val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
    val fmt = new graft.sources.formats.CramFormat(None, Nil)
    val viaCrai = fmt.alignedCutOffsets(fs, p, f.length())
    // the no-index copy must resolve through the sweep
    val nf = new java.io.File(cramNoIdxDir).listFiles()
      .filter(_.getName.endsWith(".cram")).minBy(_.getName)
    val swept = fmt.alignedCutOffsets(fs,
      new org.apache.hadoop.fs.Path(nf.getAbsolutePath), nf.length())
    assert(swept != null && swept.nonEmpty, "sweep returned no offsets")
    // crai offsets (data containers) are a subset of the swept container
    // starts (which also include the EOF container)
    assert(viaCrai.toSet.subsetOf(swept.toSet),
      "crai offsets are not all true container starts per the sweep")
  }
}
