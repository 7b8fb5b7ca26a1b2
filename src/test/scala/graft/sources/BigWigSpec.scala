package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** BigWig goldens from bigwig-tests.slt. */
class BigWigSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("bigwig value: 6 golden rows") {
    val df = spark.read.format("bigwig_value").load(s"$fx/bigwig/test.bw")
      .orderBy("name", "start")
    assert(df.collect().toSeq == Seq(
      Row("1", 0, 1, 0.1f), Row("1", 1, 2, 0.2f), Row("1", 2, 3, 0.3f),
      Row("1", 100, 150, 1.4f), Row("1", 150, 151, 1.5f),
      Row("10", 200, 300, 2.0f)))
    // region filter composes (overlap on name)
    graft.GraftSession.registerAll(spark)
    df.createOrReplaceTempView("bw_t")
    val n = spark.sql(
      "SELECT COUNT(*) FROM bw_t WHERE bigwig_region_filter('10', name) = true")
      .head().getLong(0)
    assert(n == 1)
  }

  test("bigwig zoom: reduction level 400 golden rows") {
    val df = spark.read.format("bigwig_zoom").option("reductionLevel", "400")
      .load(s"$fx/bigwig/test.bw").orderBy("name")
    val rows = df.collect().toSeq
    assert(rows.length == 2)
    val r1 = rows.head
    assert(r1.getString(0) == "1" && r1.getInt(1) == 0 && r1.getInt(2) == 400)
    assert(r1.getInt(3) == 0 && r1.getInt(4) == 54)
    assert(r1.getDouble(5) == 1.5 && math.abs(r1.getDouble(6) - 0.10000000149011612) < 1e-15)
    assert(math.abs(r1.getDouble(7) - 100.3899917602539) < 1e-10)
    assert(math.abs(r1.getDouble(8) - 72.0999984741211) < 1e-10)
    val r2 = rows(1)
    assert(r2 == Row("10", 200, 600, 0, 100, 2.0, 2.0, 400.0, 200.0))
  }

  test("bigwig value: region option uses 0-based half-open overlap") {
    // records on chrom '1': [0,1) [1,2) [2,3) [100,150) [150,151)
    // 1-based region 1:1-1 = base 1 = 0-based [0,1) -> only the first record
    val one = spark.read.format("bigwig_value").option("region", "1:1-1")
      .load(s"$fx/bigwig/test.bw")
    assert(one.collect().toSeq == Seq(org.apache.spark.sql.Row("1", 0, 1, 0.1f)))
    val two = spark.read.format("bigwig_value").option("region", "1:1-2")
      .load(s"$fx/bigwig/test.bw")
    assert(two.count() == 2)
  }

  test("auto provider threads region into R-tree pruning like bigwig_value") {
    // format("graft") on a .bw path must resolve through the SAME
    // region-capable resolver as the dedicated provider — identical rows
    // AND identical pruned scan (not the generic row filter over all
    // blocks).
    val auto = spark.read.format("graft").option("region", "1:1-1")
      .load(s"$fx/bigwig/test.bw")
    assert(auto.collect().toSeq == Seq(Row("1", 0, 1, 0.1f)))
    // the scan resolved to a region-CARRYING BigWigValueFormat (R-tree
    // pruning), not the region-less companion with a generic row filter
    val fmt = auto.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.asInstanceOf[GraftTable].format
    }.head
    assert(fmt.isInstanceOf[graft.sources.formats.BigWigValueFormat])
    val regions =
      fmt.asInstanceOf[graft.sources.formats.BigWigValueFormat].regions
    assert(regions.map(_._1) == Seq("1"), regions)
  }

  test("bigwig zoom: missing reduction level errors with available levels") {
    val e = intercept[Exception] {
      spark.read.format("bigwig_zoom").option("reductionLevel", "123")
        .load(s"$fx/bigwig/test.bw").count()
    }
    assert(e.getMessage == null || e.toString.contains("123") || e.getCause != null)
  }
}
