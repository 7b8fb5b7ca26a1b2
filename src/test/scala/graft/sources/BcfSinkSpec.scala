package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** BCF sink (BcfWrite): the spec-derived encoder must round-trip through
  * the fixture-proven BCF reader, the written `.csi` must prune region
  * reads, unsorted/undeclared-id writes must refuse, and the sink's own
  * multi-block output must full-scan split.
  */
class BcfSinkSpec extends AnyFunSuite with SharedSpark {

  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** Synthetic header declaring everything the synthetic rows use. */
  private def writeHeader(dir: java.io.File): String = {
    val h = new java.io.File(dir, "header.vcf")
    java.nio.file.Files.writeString(h.toPath,
      """##fileformat=VCFv4.3
        |##contig=<ID=chrA,length=100000000>
        |##contig=<ID=chrB,length=100000000>
        |##FILTER=<ID=PASS,Description="ok">
        |##FILTER=<ID=q10,Description="low">
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">
        |##INFO=<ID=AF,Number=A,Type=Float,Description="freq">
        |##INFO=<ID=KIND,Number=1,Type=String,Description="kind">
        |##INFO=<ID=DB,Number=0,Type=Flag,Description="db">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="genotype">
        |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="depth">
        |##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="quality">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	s1	s2
        |""".stripMargin)
    h.getAbsolutePath
  }

  private def synthRows(n: Long) = {
    spark.range(0, n).select(
      when(col("id") % 2 === 0, "chrA").otherwise("chrB").as("chrom"),
      ((col("id") / 2).cast("long") * 37 + 11).as("pos"),
      when(col("id") % 5 === 0, array(concat(lit("rs"), col("id").cast("string"))))
        .otherwise(lit(null).cast("array<string>")).as("id"),
      lit("A").as("ref"),
      when(col("id") % 3 === 0, array(lit("T"), lit("G"))).otherwise(array(lit("C")))
        .as("alt"),
      when(col("id") % 7 === 0, lit(null).cast("float"))
        .otherwise((col("id") % 50).cast("float") + 0.5f).as("qual"),
      when(col("id") % 4 === 0, array(lit("q10"))).otherwise(array(lit("PASS")))
        .as("filter"),
      concat(lit("DP="), (col("id") % 100).cast("string"),
        when(col("id") % 2 === 0, ";AF=0.5").otherwise(lit(";AF=0.25,0.75")),
        lit(";KIND=s"), (col("id") % 3).cast("string"),
        when(col("id") % 6 === 0, ";DB").otherwise(lit(""))).as("info"),
      concat(lit("DP:GQ\t"), (col("id") % 90).cast("string"), lit(":"),
        (col("id") % 60).cast("string"), lit("\t"),
        when(col("id") % 9 === 0, ".").otherwise((col("id") % 70).cast("string")),
        lit(":"), (col("id") % 40).cast("string")).as("formats"))
  }

  test("synthetic round trip: write bcf+csi, read back identical incl. info and formats") {
    val dir = graft.TestTmp.dir("bcf_sink").toFile
    val header = writeHeader(dir)
    val out = new java.io.File(dir, "t").getAbsolutePath
    val src = synthRows(5000)
      .repartitionByRange(2, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
    src.write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)

    val files = new java.io.File(out).listFiles().map(_.getName).filterNot(_.startsWith("_"))
    val parts = files.filter(_.endsWith(".bcf"))
    assert(parts.nonEmpty)
    parts.foreach(p => assert(files.contains(p + ".csi"), s"no .csi for $p"))

    val back = spark.read.format("bcf").load(out)
    assert(back.count() == 5000)
    val cols = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info", "formats")
    val a = src.select(cols.map(col): _*).orderBy("chrom", "pos").collect()
    val b = back.select(cols.map(col): _*).orderBy("chrom", "pos").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\n  src  $x\n  back $y") }
  }

  test("fixture parity: vcf fixture rows through the sink decode like the text reader") {
    val dir = graft.TestTmp.dir("bcf_sink_fx").toFile
    val out = new java.io.File(dir, "t").getAbsolutePath
    val vcf = spark.read.format("vcf").load(s"$fx/vcf/index.vcf")
    // the sink requires contig-in-HEADER-order (numeric here), not
    // lexicographic — rank via the header's ##contig sequence
    val order = {
      val src = scala.io.Source.fromFile(s"$fx/vcf/index.vcf")
      try src.getLines().takeWhile(_.startsWith("#"))
        .filter(_.startsWith("##contig"))
        .flatMap("<ID=([^,>]+)".r.findFirstMatchIn(_).map(_.group(1))).toList
      finally src.close()
    }
    val rank = typedLit(order.zipWithIndex.toMap)
    vcf.withColumn("rk", element_at(rank, col("chrom")))
      .coalesce(1).sortWithinPartitions(col("rk"), col("pos")).drop("rk")
      .write.format("bcf").mode("overwrite")
      .option("headerFrom", s"$fx/vcf/index.vcf").save(out)
    val back = spark.read.format("bcf").load(out)
    // formats excluded: the reader renders GT as raw spec integers (the
    // documented lossy corner, same as reading an htslib-written BCF)
    val cols = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info")
    val a = vcf.select(cols.map(col): _*).orderBy("chrom", "pos", "ref").collect()
    val b = back.select(cols.map(col): _*).orderBy("chrom", "pos", "ref").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\n  vcf $x\n  bcf $y") }
  }

  test("region read prunes through the sink's own .csi") {
    val dir = graft.TestTmp.dir("bcf_sink_rg").toFile
    val header = writeHeader(dir)
    val out = new java.io.File(dir, "t").getAbsolutePath
    synthRows(20000)
      .repartitionByRange(2, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)
    val full = spark.read.format("bcf").load(out)
    val exp = full.filter(col("chrom") === "chrB" &&
      col("pos") >= 1000L && col("pos") <= 50000L).count()
    val got = spark.read.format("bcf").option("region", "chrB:1000-50000")
      .load(out).count()
    assert(got == exp && got > 0, s"region=$got filter=$exp")
  }

  test("sink's multi-block bcf output full-scan splits through its .csi") {
    val dir = graft.TestTmp.dir("bcf_sink_split").toFile
    val header = writeHeader(dir)
    val out = new java.io.File(dir, "t").getAbsolutePath
    synthRows(120000)
      .repartitionByRange(1, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)
    val whole = spark.read.format("bcf").load(out).select("chrom", "pos", "info")
    assert(whole.rdd.getNumPartitions == 1)
    withConf("spark.sql.files.maxPartitionBytes" -> "131072",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val split = spark.read.format("bcf").load(out).select("chrom", "pos", "info")
      assert(split.rdd.getNumPartitions > 1, "bcf full-scan split did not engage")
      assert(split.count() == whole.count())
      assert(split.except(whole).count() == 0)
      assert(whole.except(split).count() == 0)
    }
  }

  test("unsorted write refused; undeclared contig/INFO refused") {
    val dir = graft.TestTmp.dir("bcf_sink_bad").toFile
    val header = writeHeader(dir)
    val out = new java.io.File(dir, "bad").getAbsolutePath
    def messages(e: Throwable): String = {
      val sb = new StringBuilder
      var t: Throwable = e
      while (t != null) { sb.append(String.valueOf(t.getMessage)).append('\n'); t = t.getCause }
      sb.toString
    }
    val unsorted = intercept[Exception] {
      synthRows(100).withColumn("pos", lit(100L) - col("pos") / 100)
        .coalesce(1)
        .write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)
    }
    assert(messages(unsorted).contains("requires rows sorted"))
    val badContig = intercept[Exception] {
      synthRows(10).withColumn("chrom", lit("chrZ")).coalesce(1)
        .sortWithinPartitions("chrom", "pos")
        .write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)
    }
    assert(messages(badContig).contains("not declared"))
    val badInfo = intercept[Exception] {
      synthRows(10).withColumn("info", lit("NOPE=1")).coalesce(1)
        .sortWithinPartitions("chrom", "pos")
        .write.format("bcf").mode("overwrite").option("headerFrom", header).save(out)
    }
    assert(messages(badInfo).contains("not declared"))
  }
}
