package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SharedSpark, TestTmp}

/** BigWig region reads must prune via the R-tree: blocks outside the
  * requested region are never read or inflated, and the surviving rows
  * match the row-filter semantics exactly.
  */
class BigWigRegionSpec extends AnyFunSuite with SharedSpark {

  private lazy val dir: String = {
    val d = TestTmp.dir("bw_region").toString
    import spark.implicits._
    val rows = for {
      chrom <- Seq("chrA", "chrB")
      i <- 0 until 1300
    } yield (chrom, i * 10, i * 10 + 10, (i % 5).toFloat)
    rows.toDF("name", "start", "end", "value")
      .repartitionByRange(2, col("name"))
      .write.format("bigwig_value").mode("overwrite")
      .option("zoomLevels", "1000").save(s"$d/t")
    d
  }

  test("region read returns exactly the overlapping intervals") {
    val got = spark.read.format("bigwig_value")
      .option("region", "chrB:5001-5100").load(s"$dir/t")
      .orderBy("start")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == (500 to 509).map(i => ("chrB", i * 10, i * 10 + 10)))
  }

  test("R-tree pruning: non-overlapping blocks are never inflated") {
    import graft.sources.formats.BbiFile
    spark.read.format("bigwig_value").load(s"$dir/t").count() // warm listing
    BbiFile.blocksDecoded.set(0)
    val n = spark.read.format("bigwig_value")
      .option("region", "chrB:5001-5100").load(s"$dir/t").count()
    assert(n == 10)
    val pruned = BbiFile.blocksDecoded.get()
    BbiFile.blocksDecoded.set(0)
    val total = spark.read.format("bigwig_value").load(s"$dir/t").count()
    val all = BbiFile.blocksDecoded.get()
    assert(total == 2600)
    // 6 data blocks total (3 sections per chrom); the region touches 1
    assert(pruned < all, s"pruned=$pruned all=$all")
    assert(pruned <= 2, s"pruned=$pruned")
  }

  test("zoom region read prunes and filters the same way") {
    val z = spark.read.format("bigwig_zoom")
      .option("reductionLevel", "1000").option("region", "chrB:5001-5100")
      .load(s"$dir/t").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(z.toSeq == Seq(("chrB", 5000)))
  }
}
