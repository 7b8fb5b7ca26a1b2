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

  // ---- independent pure-Python cross-validation (tools/pin_bigwig.py,
  // written from the public Kent spec with no shared code) — closes the
  // "no external bigwig tool in sandbox" caveat: sink output must decode
  // under a non-JVM reader, and that reader is itself validated against
  // the externally-produced reference fixture below.

  private def pin(args: String*): (Int, Seq[String]) = {
    import scala.sys.process._
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val cmd = Seq("python3", "tools/pin_bigwig.py") ++ args
    val code = cmd ! ProcessLogger(buf += _, buf += _)
    (code, buf.toSeq)
  }

  private def python3Available: Boolean =
    try { import scala.sys.process._
      Seq("python3", "-c", "0").! == 0
    } catch { case _: Exception => false }

  private def partFile(dir: String): java.io.File =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bw")).head

  test("sink output decodes under the independent Python reader") {
    assume(python3Available, "python3 not on PATH")
    val dir = TestTmp.dir("bw_pin").toString
    val rows = Seq(
      ("chrA", 0, 100, 1.5f), ("chrA", 100, 250, 2.0f), ("chrA", 300, 400, 0.5f),
      ("chrB", 10, 60, 7.25f))
    track(rows).coalesce(1).write.format("bigwig_value").mode("overwrite")
      .option("zoomLevels", "100").save(s"$dir/t")
    val bw = partFile(s"$dir/t").getPath
    val (c0, structural) = pin(bw, "--check")
    assert(c0 == 0, structural.mkString("\n"))
    assert(structural.exists(_.endsWith("OK")), structural.mkString("\n"))
    val (c1, values) = pin(bw)
    assert(c1 == 0)
    val expected = rows.sortBy(t => (t._1, t._2)).map { case (n, s, e, v) =>
      s"$n\t$s\t$e\t${java.lang.Float.floatToIntBits(v) & 0xffffffffL}"
    }
    assert(values == expected)
    // zoom rl=100: per-base weighted summaries, f32 bit-exact
    val (c2, zoom) = pin(bw, "--zoom", "100")
    assert(c2 == 0)
    def bits(f: Float) = java.lang.Float.floatToIntBits(f) & 0xffffffffL
    assert(zoom == Seq(
      s"chrA\t0\t100\t100\t${bits(1.5f)}\t${bits(1.5f)}\t${bits(150f)}\t${bits(225f)}",
      s"chrA\t100\t200\t100\t${bits(2f)}\t${bits(2f)}\t${bits(200f)}\t${bits(400f)}",
      s"chrA\t200\t300\t50\t${bits(2f)}\t${bits(2f)}\t${bits(100f)}\t${bits(200f)}",
      s"chrA\t300\t400\t100\t${bits(0.5f)}\t${bits(0.5f)}\t${bits(50f)}\t${bits(25f)}",
      s"chrB\t0\t60\t50\t${bits(7.25f)}\t${bits(7.25f)}\t${bits(362.5f)}\t${bits(2628.125f)}"))
  }

  test("Python reader and Spark reader agree on the external fixture") {
    assume(python3Available, "python3 not on PATH")
    val fx = "/root/reference/exon/exon-core/test-data/datasources/bigwig/test.bw"
    assume(new java.io.File(fx).exists(), "reference fixture not present")
    val (code, pyRows) = pin(fx)
    assert(code == 0)
    val sparkRows = spark.read.format("bigwig_value").load(fx)
      .collect().map { r =>
        s"${r.getString(0)}\t${r.getInt(1)}\t${r.getInt(2)}\t" +
          s"${java.lang.Float.floatToIntBits(r.getFloat(3)) & 0xffffffffL}"
      }.sorted.toSeq
    assert(pyRows.sorted == sparkRows)
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
