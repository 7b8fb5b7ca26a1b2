package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.{SharedSpark, TestTmp}

/** Corrupt BigWig inputs must fail loudly (bad-magic requires, bounded
  * EOF) — never hang, never return silently-wrong rows. Same discipline
  * as the CRAM corruption fuzzing.
  */
class BigWigCorruptionSpec extends AnyFunSuite with SharedSpark {

  private def goodFile(): java.nio.file.Path = {
    import spark.implicits._
    val dir = TestTmp.dir("bw_fuzz")
    Seq(("chrA", 0, 100, 1.0f), ("chrA", 100, 300, 2.0f))
      .toDF("name", "start", "end", "value")
      .coalesce(1)
      .write.format("bigwig_value").mode("overwrite")
      .save(dir.resolve("t").toString)
    Files.list(dir.resolve("t")).filter(_.toString.endsWith(".bw"))
      .findFirst().get()
  }

  private def readAll(p: java.nio.file.Path): Long =
    spark.read.format("bigwig_value").load(p.toString).count()

  test("good file reads back") {
    assert(readAll(goodFile()) == 2)
  }

  test("flipped header magic is rejected") {
    val src = goodFile()
    val bytes = Files.readAllBytes(src)
    bytes(0) = (bytes(0) ^ 0xff).toByte
    val bad = TestTmp.file("bw_badmagic", ".bw")
    Files.write(bad, bytes)
    val e = intercept[Exception](readAll(bad))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("not a BigWig")), e)
  }

  test("truncation at every structural boundary fails cleanly") {
    val src = goodFile()
    val bytes = Files.readAllBytes(src)
    def u64(off: Int): Long = {
      var v = 0L
      (0 until 8).foreach(i => v |= (bytes(off + i) & 0xffL) << (8 * i))
      v
    }
    val chromTreeOffset = u64(8).toInt
    val fullDataOffset = u64(16).toInt
    val fullIndexOffset = u64(24).toInt
    // mid-header, mid-chrom-tree, mid-data-block, mid-R-tree: every
    // structure the VALUE read path walks (zoom-only tails are allowed
    // to be missing for a value scan)
    Seq(10, 40, chromTreeOffset + 10, fullDataOffset + 12,
        fullIndexOffset + 20).foreach { cut =>
      val bad = TestTmp.file(s"bw_trunc$cut", ".bw")
      Files.write(bad, java.util.Arrays.copyOf(bytes, cut))
      intercept[Exception](readAll(bad))
    }
  }
}
