package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** DSv2 custom metrics on the graft scan node: planning-side pruning
  * counters (filesListed/chunksPlanned/plannedBytes via
  * reportDriverMetrics) and task-side decode counters
  * (chunksRead/recordsParsed via currentMetricsValues) must land in the
  * scan's SQLMetrics after execution — the per-query observability a
  * production deployment steers by.
  */
class ScanMetricsSpec extends AnyFunSuite with SharedSpark {

  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  private def scanMetrics(df: DataFrame): Map[String, Long] = {
    df.collect() // execute so accumulators fill
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other +: other.children.flatMap(unwrap)
    }
    val scans = unwrap(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in the executed plan")
    scans.head.metrics.map { case (k, m) => k -> m.value }
  }

  test("driver planning metrics and task decode metrics land on the scan node") {
    val m = scanMetrics(
      spark.read.format("gff").load(s"$fx/gff/test.gff").select("seqname"))
    assert(m.getOrElse("filesListed", -1L) == 1L, m.toString)
    assert(m.getOrElse("chunksPlanned", -1L) == 1L, m.toString)
    assert(m.getOrElse("plannedBytes", 0L) > 0L, m.toString)
    assert(m.getOrElse("chunksRead", -1L) == 1L, m.toString)
    assert(m.getOrElse("recordsParsed", 0L) == 5000L, m.toString)
  }

  test("recordsParsed counts pre-residual rows on a region read (selectivity visible)") {
    // region read over the tabix-indexed fixture: chunk pruning bounds what
    // is parsed, the region filter drops some parsed rows — recordsParsed
    // must sit between the output rows and the whole file's record count
    val gz = s"$fx/gff-index/gencode.v38.polyAs.gff.gz"
    val n = spark.read.format("gff")
      .option("region", "chr1:100000-200000").load(gz).count()
    assert(n > 0)
    val m = scanMetrics(
      spark.read.format("gff")
        .option("region", "chr1:100000-200000").load(gz)
        .select("seqname", "start", "end"))
    val parsed = m.getOrElse("recordsParsed", -1L)
    assert(parsed >= n, s"parsed $parsed < output $n")
    assert(m.getOrElse("chunksPlanned", -1L) >= 1L)
  }

  test("a split scan reports every chunk planned and read") {
    val dir = graft.TestTmp.dir("metrics_split")
    val sb = new StringBuilder()
    (1 to 120000).foreach(i => sb.append(s"chr1\tsrc\tgene\t$i\t${i + 50}\t.\t+\t.\tID=g$i\n"))
    java.nio.file.Files.writeString(
      new java.io.File(dir.toFile, "big.gff").toPath, sb.toString)
    val saved = Seq("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
      spark.conf.set("spark.sql.files.openCostInBytes", "65536")
      val m = scanMetrics(spark.read.format("gff").load(dir.toString).select("start"))
      assert(m.getOrElse("chunksPlanned", -1L) > 2L, m.toString)
      assert(m("chunksRead") == m("chunksPlanned"), m.toString)
      assert(m.getOrElse("recordsParsed", 0L) == 120000L, m.toString)
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
