package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SharedSpark, TestTmp}

/** BigWig sink: values and writer-computed zoom levels must round-trip
  * through the independent reader path (BbiFile header/chrom-tree/R-tree
  * walkers), including bin-split accumulation, multi-section files, and
  * the two-level R-tree.
  */
class BigWigWriteSpec extends AnyFunSuite with SharedSpark {

  private def track(rows: Seq[(String, Int, Int, Float)]) = {
    import spark.implicits._
    rows.toDF("name", "start", "end", "value")
  }

  test("value rows round-trip exactly") {
    val dir = TestTmp.dir("bw_rt").toString
    val rows = Seq(
      ("chrA", 0, 100, 1.5f), ("chrA", 100, 250, 2.0f), ("chrA", 300, 400, 0.5f),
      ("chrB", 10, 60, 7.25f))
    track(rows).write.format("bigwig_value").mode("overwrite").save(s"$dir/t")
    val back = spark.read.format("bigwig_value").load(s"$dir/t")
      .orderBy("name", "start")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getFloat(3)))
    assert(back.toSeq == rows.sortBy(t => (t._1, t._2)))
  }

  test("zoom bins split intervals at bin boundaries, per-base weighted") {
    val dir = TestTmp.dir("bw_zoom").toString
    // [50,150) v=2 spans two rl=100 bins: 50 bases each side
    val rows = Seq(("chrA", 50, 150, 2.0f), ("chrA", 160, 180, 4.0f))
    // one shard: zoom bins are per part file; at scale, range-partition by
    // chrom upstream so a bin never straddles shards
    track(rows).coalesce(1).write.format("bigwig_value").mode("overwrite")
      .option("zoomLevels", "100").save(s"$dir/t")
    val z = spark.read.format("bigwig_zoom").option("reductionLevel", "100")
      .load(s"$dir/t").orderBy("start")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(4),
        r.getDouble(6), r.getDouble(5), r.getDouble(8), r.getDouble(7)))
    // (start, end, bases, min, max, sum, sumSq); end clipped to extent
    assert(z.toSeq == Seq(
      (0, 100, 50, 2.0, 2.0, 100.0, 200.0),
      (100, 180, 70, 2.0, 4.0, 180.0, 520.0)))
  }

  test("multi-section + two-level R-tree survives at 140k intervals") {
    val dir = TestTmp.dir("bw_big").toString
    import spark.implicits._
    val n = 140000
    spark.range(n).select(lit("chr1").as("name"),
        (col("id") * 10).cast("int").as("start"),
        (col("id") * 10 + 10).cast("int").as("end"),
        (col("id") % 7).cast("float").as("value"))
      .coalesce(1)
      .write.format("bigwig_value").mode("overwrite")
      .option("zoomLevels", "1000").save(s"$dir/t")
    val back = spark.read.format("bigwig_value").load(s"$dir/t")
    val agg = back.agg(count(lit(1)), sum(col("value")), max(col("end"))).head()
    assert(agg.getLong(0) == n)
    assert(agg.getDouble(1) == (0 until n).map(_ % 7).sum.toDouble)
    assert(agg.getInt(2) == n * 10)
  }

  test("overlapping intervals are refused") {
    val dir = TestTmp.dir("bw_bad").toString
    val e = intercept[Exception] {
      track(Seq(("chrA", 0, 100, 1f), ("chrA", 50, 80, 2f)))
        .coalesce(1)
        .write.format("bigwig_value").mode("overwrite").save(s"$dir/t")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("overlapping")), e)
  }
}
