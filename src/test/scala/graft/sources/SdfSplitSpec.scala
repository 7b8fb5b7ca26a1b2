package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Record-aligned splits of big uncompressed SDF files ($$$$-delimited
  * molecule records — the PubChem-dump landing shape). Records here are
  * built BYTE-IDENTICAL in length, so maxPartitionBytes choices place
  * every cut at a KNOWN in-record offset: exactly on a record start,
  * inside the `$$$$` terminator line, on its newline, mid-molfile, and
  * mid-data-item — each must yield the same rows (the lookback
  * disambiguation in SdfFormat is what makes the exact-record-start case
  * work; a scan-to-terminator alignment alone would lose that record).
  */
class SdfSplitSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def recordText(k: Int): String =
    f"MOL$k%05d\n" +
      "  SYNTH\n" +
      "comment\n" +
      "  2  1  0  0  0  0  0  0  0  0999 V2000\n" +
      "    0.0000    0.0000    0.0000 C\n" +
      "    1.0000    0.0000    0.0000 O\n" +
      "  1  2  1  0\n" +
      "M  END\n" +
      "> <id>\n" +
      f"$k%05d\n" +
      "\n" +
      "$$$$\n"

  private lazy val (sdfFile, recLen): (java.io.File, Int) = {
    val dir = graft.TestTmp.dir("sdf_split")
    val f = new java.io.File(dir.toFile, "mols.sdf")
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val l0 = recordText(0).length
    (0 until 4000).foreach { k =>
      val t = recordText(k)
      assert(t.length == l0, "records must be byte-identical in length")
      w.write(t)
    }
    w.close()
    (f, l0)
  }

  private def read(path: String): DataFrame =
    spark.read.format("sdf").load(path)
      .select(col("header"), col("atom_count"), col("bond_count"),
        col("data")("id").as("id"))

  test("big sdf fans out at record boundaries; rows invariant") {
    val whole = read(sdfFile.getAbsolutePath)
    assert(whole.rdd.getNumPartitions == 1, "corpus unexpectedly split at default conf")
    assert(whole.count() == 4000)
    withConf("spark.sql.files.maxPartitionBytes" -> "65536",
             "spark.sql.files.openCostInBytes" -> "16384") {
      val split = read(sdfFile.getAbsolutePath)
      val parts = split.rdd.getNumPartitions
      assert(parts >= 4, s"sdf record split did not engage: $parts partition(s)")
      assert(split.count() == 4000)
      assert(split.except(whole).count() == 0 && whole.except(split).count() == 0,
        "split scan produced different rows")
    }
  }

  test("cuts at every critical in-record offset yield identical rows") {
    val whole = read(sdfFile.getAbsolutePath)
    val base = 300 * recLen
    // offsets relative to a record start: 0 = exactly ON a start (the
    // lookback case), -1 = on the terminator's newline, -5 = inside
    // '$$$$', -6 = at the '$$$$' line start, +7 = mid-name-line,
    // +recLen/2 = mid-molfile
    for (delta <- Seq(0, -1, -5, -6, 7, recLen / 2)) {
      withConf("spark.sql.files.maxPartitionBytes" -> (base + delta).toString,
               "spark.sql.files.openCostInBytes" -> "1024") {
        val split = read(sdfFile.getAbsolutePath)
        assert(split.rdd.getNumPartitions >= 3, s"no fan-out at delta=$delta")
        assert(split.except(whole).count() == 0 && whole.except(split).count() == 0,
          s"rows not invariant with cuts at record offset $delta")
      }
    }
  }

  // The lookback must judge the COMPLETE line before the cut: an 80-byte
  // window over a longer line sees only its tail, and a tail of
  // whitespace+'$$$$' was misread as a record terminator — the chunk then
  // skipped the mid-record discard and emitted a garbage record from the
  // remaining data items (the true owner also emits the real one).
  test("line longer than the lookback window ending in spaces+'$$$$' is not a terminator") {
    val dir = graft.TestTmp.dir("sdf_split_longline")
    val f = new java.io.File(dir.toFile, "long.sdf")
    val longLine = "y" * 110 + " " * 80 + "$$$$" // 194 chars, tail trims to "$$$$"
    def rec(k: Int): String =
      f"MOL$k%05d\n  SYNTH\ncomment\n" +
        "  2  1  0  0  0  0  0  0  0  0999 V2000\n" +
        "    0.0000    0.0000    0.0000 C\n" +
        "    1.0000    0.0000    0.0000 O\n" +
        "  1  2  1  0\nM  END\n" +
        s"> <longv>\n$longLine\n\n" +
        f"> <id>\n$k%05d\n\n$$$$$$$$\n"
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val l0 = rec(0).length
    (0 until 2000).foreach { k =>
      val t = rec(k); assert(t.length == l0); w.write(t)
    }
    w.close()
    val longOff = rec(0).indexOf(longLine)
    val whole = read(f.getAbsolutePath)
    assert(whole.count() == 2000)
    // first cut lands 100 bytes into record 300's long line: the first
    // complete line of the next chunk is the blank after it, and the
    // lookback judges the long line
    withConf("spark.sql.files.maxPartitionBytes" -> (300 * l0 + longOff + 100).toString,
             "spark.sql.files.openCostInBytes" -> "1024") {
      val split = read(f.getAbsolutePath)
      assert(split.rdd.getNumPartitions >= 3, "no fan-out")
      assert(split.count() == 2000, "garbage record from a misread line tail")
      assert(split.except(whole).count() == 0 && whole.except(split).count() == 0)
    }
  }

  test("split rows parse fully: counts and data items exact") {
    withConf("spark.sql.files.maxPartitionBytes" -> "65536",
             "spark.sql.files.openCostInBytes" -> "1024") {
      val df = spark.read.format("sdf").load(sdfFile.getAbsolutePath)
      val r = df.agg(
        count(lit(1)),
        sum(col("atom_count")),
        sum(col("bond_count")),
        sum(col("data")("id").cast("long"))).head
      assert(r.getLong(0) == 4000)
      assert(r.getLong(1) == 8000 && r.getLong(2) == 4000)
      assert(r.getLong(3) == 4000L * 3999 / 2, "data items must survive the split")
    }
  }
}
