package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Bgzipped indexed FASTA — the `samtools faidx ref.fa.gz` layout: the
  * sink's `option("compression","bgzf")` commits `.fa.gz` + `.fai`
  * (uncompressed-domain offsets) + `.gzi` (block map); region subsequence
  * reads then SEEK the compressed file, full scans split record-aligned
  * via fai+gzi with '>'-validated cut points, and count(*) answers from
  * the `.fai` without reading data.
  */
class FastaBgzfSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** Engine-written bgzipped FASTA: 2000 sequences with deterministic
    * content, one shard so one `.fa.gz` + `.fai` + `.gzi` triple.
    */
  private lazy val dir: String = {
    val d = graft.TestTmp.dir("fasta_bgzf").toString + "/t"
    spark.range(0, 2000).select(
        concat(lit("seq"), format_string("%04d", col("id"))).as("id"),
        lit(null).cast("string").as("description"),
        // length 200 + (id % 37), content varies per id via md5
        translate(substring(concat(md5(col("id").cast("string")),
          md5((col("id") + 5000).cast("string")),
          md5((col("id") + 9000).cast("string")),
          md5((col("id") + 13000).cast("string")),
          md5((col("id") + 17000).cast("string")),
          md5((col("id") + 21000).cast("string")),
          md5((col("id") + 25000).cast("string")),
          md5((col("id") + 29000).cast("string"))), lit(1),
          (lit(200) + col("id") % 37).cast("int")),
          "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"))
      .coalesce(1).sortWithinPartitions("id")
      .write.format("fasta").mode("overwrite")
      .option("compression", "bgzf").save(d)
    d
  }

  test("bgzf fasta sink commits .fai and .gzi siblings") {
    val names = new java.io.File(dir).listFiles.map(_.getName)
    assert(names.exists(_.endsWith(".fasta.gz")), names.mkString(","))
    assert(names.exists(_.endsWith(".fasta.gz.fai")), names.mkString(","))
    assert(names.exists(_.endsWith(".fasta.gz.gzi")), names.mkString(","))
    assert(spark.read.format("fasta").load(dir).count() == 2000)
  }

  test("region subsequence reads seek the bgzipped file via .fai + .gzi") {
    val gz = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".fasta.gz")).head.getAbsolutePath
    // whole-sequence read through the plain reader = ground truth
    val truth = spark.read.format("fasta").load(gz)
      .filter(col("id") === "seq1234").select("sequence").head.getString(0)
    val sub = spark.read.format("fasta")
      .option("region", "seq1234:11-60").load(gz)
      .select("sequence").head.getString(0)
    assert(sub == truth.substring(10, 60))
    // open-ended region = whole sequence
    val whole = spark.read.format("fasta")
      .option("region", "seq0007").load(gz)
      .select("sequence").head.getString(0)
    val truth7 = spark.read.format("fasta").load(gz)
      .filter(col("id") === "seq0007").select("sequence").head.getString(0)
    assert(whole == truth7)
  }

  test("full scan splits record-aligned via fai+gzi; rows invariant") {
    val whole = spark.read.format("fasta").load(dir)
      .select("id", "sequence")
    assert(whole.rdd.getNumPartitions == 1)
    withConf("spark.sql.files.maxPartitionBytes" -> "16384",
             "spark.sql.files.openCostInBytes" -> "4096") {
      val split = spark.read.format("fasta").load(dir)
        .select("id", "sequence")
      val parts = split.rdd.getNumPartitions
      assert(parts > 2, s"expected >2 fai+gzi chunk partitions, got $parts")
      assert(split.count() == 2000)
      assert(split.except(whole).count() == 0)
      assert(whole.except(split).count() == 0)
    }
  }

  test("count(*) on bgzipped indexed fasta answers from the .fai metadata") {
    val counted = spark.read.format("fasta").load(dir).groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("GraftCountScan"), plan)
    assert(counted.head.getLong(0) == 2000L)
  }
}
