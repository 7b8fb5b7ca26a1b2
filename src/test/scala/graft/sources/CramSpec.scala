package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** CRAM reader goldens (cram-select-tests.slt + reference inline counts). */
class CramSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("cram: 15 records, golden first row, tags") {
    val df = spark.read.format("cram").load(s"$fx/cram/test_input_1_a.cram")
    assert(df.count() == 15)
    val r = df.select("name", "flag", "reference", "start", "end",
      "mapping_quality", "cigar", "mate_reference").head()
    assert(r.getString(0) == "r000")
    assert(r.getInt(1) == 99)
    assert(r.getString(2) == "insert")
    assert(r.getLong(3) == 50L)
    assert(r.getLong(4) == 59L)
    assert(r.getString(5) == "30")
    assert(r.getString(6) == "10M")
    assert(r.getString(7) == "insert")
    val tags = df.select("tags").head().getSeq[org.apache.spark.sql.Row](0)
    assert(tags == Seq(org.apache.spark.sql.Row("PG", "bull")))
  }

  test("cram: mapped file with reference reconstructs sequences") {
    val df = spark.read.format("cram")
      .option("fastaReference", s"$fx/cram/ce.fa").load(s"$fx/cram/0500_mapped.cram")
    val r = df.select("name", "flag", "reference", "start", "end").head()
    assert(r == org.apache.spark.sql.Row("match", 99, "CHROMOSOME_I", 1000L, 1099L))
    // the 'match' records align perfectly: sequence == reference substring
    val ref = scala.io.Source.fromFile(s"$fx/cram/ce.fa").getLines()
      .foldLeft((Map.empty[String, StringBuilder], "")) { case ((m, cur), l) =>
        if (l.startsWith(">")) { val n = l.drop(1).split("\\s+")(0); (m + (n -> new StringBuilder), n) }
        else { m(cur) ++= l.trim; (m, cur) }
      }._1.map { case (k, v) => k -> v.toString }
    df.select("reference", "start", "sequence").collect().foreach { row =>
      val exp = ref(row.getString(0)).substring(row.getLong(1).toInt - 1,
        row.getLong(1).toInt - 1 + row.getString(2).length)
      assert(row.getString(2).equalsIgnoreCase(exp), s"sequence mismatch at ${row.getLong(1)}")
    }
    // without the reference, mapped sequences are null
    val bare = spark.read.format("cram").load(s"$fx/cram/0500_mapped.cram")
    assert(bare.select("sequence").head().isNullAt(0))
  }

  test("cram: two-cram fixture count and multislice fixture") {
    assert(spark.read.format("cram").load(s"$fx/two-cram/twolib.sorted.cram").count() == 4)
    // 14 slices across 7 data containers = 910 records
    assert(spark.read.format("cram")
      .load(s"$fx/cram/1404_index_multislice.cram").count() == 910)
    // region filter (row-filter path; reference golden: region '1' -> 0)
    assert(spark.read.format("cram").option("region", "1")
      .load(s"$fx/two-cram/twolib.sorted.cram").count() == 0)
  }

  test("cram: complex cigars reconstructed from features") {
    val df = spark.read.format("cram").load(s"$fx/cram/test_input_1_a.cram")
    val cigars = df.filter(col("reference") === "ref1")
      .select("name", "cigar").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cigars.contains(("r001", "8M4I4M1D3M")))
    assert(cigars.contains(("r004", "6M14N1I5M")))
    assert(cigars.contains(("r003", "5H6M")))
  }

  // ---- container pruning (.crai + header coordinates) ----
  // 1404_index_multislice.cram: 7 data containers at offsets 405/1740
  // (CHROMOSOME_I), 2610 (CHROMOSOME_II), 3001/4339 (CHROMOSOME_III),
  // 5209/6442 (unmapped); sibling .crai present.

  // containersSkipped is process-global and sbt suites share one JVM, so a
  // concurrent CRAM scan from another suite can bleed increments into the
  // window. Measure a delta around the read and assert a lower bound —
  // bleed can only inflate it, and an under-pruning bug still fails.
  private def skippedDelta(read: => Long): (Long, Long) = {
    val before = formats.CramFormat.containersSkipped.get()
    val n = read
    (n, formats.CramFormat.containersSkipped.get() - before)
  }

  test("cram: .crai prunes non-overlapping containers for a region") {
    val p = s"$fx/cram/1404_index_multislice.cram"
    val (n, skipped) = skippedDelta(
      spark.read.format("cram").option("region", "CHROMOSOME_II").load(p).count())
    assert(n == 10)
    assert(skipped >= 6, s"expected >=6 skipped containers, got $skipped")
  }

  test("cram: header pruning works without a .crai") {
    // copy the fixture without its index; header coordinates still prune
    val dir = graft.TestTmp.dir("graft_cram_noidx")
    val dst = dir.resolve("multi.cram")
    java.nio.file.Files.copy(java.nio.file.Paths.get(
      s"$fx/cram/1404_index_multislice.cram"), dst)
    val (n, skipped) = skippedDelta(
      spark.read.format("cram").option("region", "CHROMOSOME_II")
        .load(dst.toString).count())
    assert(n == 10)
    assert(skipped >= 6)
  }

  test("cram: pruning honors the union of region and regionFile") {
    // region names CHROMOSOME_II (10 recs), regionFile adds
    // CHROMOSOME_I:200-210 (20 recs). Pruning from `region` alone would
    // skip the CHROMOSOME_I containers and silently drop those 20 rows.
    val p = s"$fx/cram/1404_index_multislice.cram"
    val rf = graft.TestTmp.file("graft_cram_regions", ".txt")
    java.nio.file.Files.write(rf, "CHROMOSOME_I:200-210\n".getBytes)
    val df = spark.read.format("cram")
      .option("region", "CHROMOSOME_II")
      .option("regionFile", rf.toString)
      .load(p)
    assert(df.count() == 30)
    assert(df.filter(col("reference") === "CHROMOSOME_I").count() == 20)
    assert(df.filter(col("reference") === "CHROMOSOME_II").count() == 10)
  }

  test("cram: interval region agrees with the row-filter over a full scan") {
    val p = s"$fx/cram/1404_index_multislice.cram"
    val pruned = spark.read.format("cram").option("region", "CHROMOSOME_I:200-210")
      .load(p).count()
    val full = spark.read.format("cram").load(p)
      .filter(col("reference") === "CHROMOSOME_I" && col("start") <= 210 && col("end") >= 200)
      .count()
    assert(pruned == full && pruned > 0)
  }

  test("cram: order-1/bzip2/lzma block codecs decode end-to-end") {
    // fixtures produced by tools/recompress_cram.py: identical records,
    // every sizable block re-encoded with rANS order-1 (samtools' default)
    // rotating in bzip2 and lzma — codecs absent from the checkout's own
    // fixtures, which are raw/gzip/rANS-order-0 only.
    def res(n: String): String = getClass.getResource(s"/cram/$n").getPath
    val cols = Seq("name", "flag", "reference", "start", "end",
      "mapping_quality", "cigar", "sequence", "quality_score")
    def rows(p: String) = spark.read.format("cram").load(p)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    assert(rows(res("test_input_1_a_o1.cram")) ==
      rows(s"$fx/cram/test_input_1_a.cram"))
    assert(rows(res("1404_index_multislice_o1.cram")) ==
      rows(s"$fx/cram/1404_index_multislice.cram"))
    // pruning still works on the recompressed file (header coordinates)
    assert(spark.read.format("cram").option("region", "CHROMOSOME_II")
      .load(res("1404_index_multislice_o1.cram")).count() == 10)
  }

  test("cram 3.1: rANS Nx16 blocks decode end-to-end, all transform modes") {
    // fixtures from tools/recompress_cram.py v31 mode: identical records,
    // file definition says 3.1, name-shaped blocks re-encoded with the
    // tok3 tokeniser (method 8) and every other sizable block as rANS
    // Nx16 (method 5) rotating through order-0/1, X32, STRIPE, RLE, PACK
    // and NOSZ — the full implemented 3.1 codec surface in two files.
    def res(n: String): String = getClass.getResource(s"/cram/$n").getPath
    val cols = Seq("name", "flag", "reference", "start", "end",
      "mapping_quality", "cigar", "sequence", "quality_score")
    def rows(p: String) = spark.read.format("cram").load(p)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    assert(rows(res("test_input_1_a_v31.cram")) ==
      rows(s"$fx/cram/test_input_1_a.cram"))
    assert(rows(res("1404_index_multislice_v31.cram")) ==
      rows(s"$fx/cram/1404_index_multislice.cram"))
    // header-coordinate pruning is codec-independent and still works on 3.1
    assert(spark.read.format("cram").option("region", "CHROMOSOME_II")
      .load(res("1404_index_multislice_v31.cram")).count() == 10)
  }

  test("cram 3.1: adaptive-arithmetic blocks decode end-to-end, all modes") {
    // fixtures from tools/recompress_cram.py v31a mode: identical records,
    // name-shaped blocks as tok3 with ARITH-compressed token streams,
    // quality-shaped blocks as fqzcomp (method 7), and every other sizable
    // block as the adaptive arithmetic coder (method 6) rotating through
    // order-0/1, RLE, EXT (bzip2), STRIPE, PACK, NOSZ — so the two files
    // cover the complete CRAM 3.1 codec surface end-to-end.
    def res(n: String): String = getClass.getResource(s"/cram/$n").getPath
    val cols = Seq("name", "flag", "reference", "start", "end",
      "mapping_quality", "cigar", "sequence", "quality_score")
    def rows(p: String) = spark.read.format("cram").load(p)
      .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
    assert(rows(res("test_input_1_a_v31a.cram")) ==
      rows(s"$fx/cram/test_input_1_a.cram"))
    assert(rows(res("1404_index_multislice_v31a.cram")) ==
      rows(s"$fx/cram/1404_index_multislice.cram"))
    assert(spark.read.format("cram").option("region", "CHROMOSOME_II")
      .load(res("1404_index_multislice_v31a.cram")).count() == 10)
  }

  test("cram: non-3.x versions and bad magic are rejected loudly, not decoded as garbage") {
    val src = java.nio.file.Paths.get(s"$fx/cram/test_input_1_a.cram")
    val dir = graft.TestTmp.dir("cram_ver")
    def mutated(name: String)(f: Array[Byte] => Unit): String = {
      val bytes = java.nio.file.Files.readAllBytes(src)
      f(bytes)
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, bytes)
      p.toString
    }
    // 3.1 shares the 3.0 container layout, so a version-bumped 3.0 file
    // must decode identically (its 4x8/gzip codecs stay legal in 3.1)
    val v31 = mutated("v31.cram") { b => b(4) = 3; b(5) = 1 }
    assert(spark.read.format("cram").load(v31).count() == 15)
    val v32 = mutated("v32.cram") { b => b(4) = 3; b(5) = 2 }
    val e1 = intercept[Exception] {
      spark.read.format("cram").load(v32).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("unsupported CRAM version 3.2") &&
      e1.getMessage.contains("3.0 and 3.1"), e1.getMessage)
    val badMagic = mutated("bad.cram") { b => b(0) = 'X'.toByte }
    val e2 = intercept[Exception] {
      spark.read.format("cram").load(badMagic).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("not a CRAM file"), e2.getMessage)
  }

  test("cram: a flipped payload byte fails the block CRC loudly, not as garbage rows") {
    // bit rot inside an entropy-coded payload can decode to right-sized
    // garbage; the per-block CRC32 must catch it before records surface
    val src = java.nio.file.Paths.get(s"$fx/cram/test_input_1_a.cram")
    val bytes = java.nio.file.Files.readAllBytes(src)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x20).toByte
    val dir = graft.TestTmp.dir("cram_crc")
    val p = dir.resolve("flip.cram")
    java.nio.file.Files.write(p, bytes)
    val e = intercept[Exception] {
      spark.read.format("cram").load(p.toString).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("CRC"), e.getMessage)
  }

  test("crai index parse + wantedContainers") {
    val fs = new org.apache.hadoop.fs.Path(fx).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    val entries = CraiIndex.read(fs,
      new org.apache.hadoop.fs.Path(s"$fx/cram/1404_index_multislice.cram")).get
    assert(entries.length == 16)
    assert(CraiIndex.wantedContainers(entries, 1, 1L, Long.MaxValue / 2) == Set(2610L))
    assert(CraiIndex.wantedContainers(entries, 0, 200L, 210L) == Set(405L, 1740L))
    assert(CraiIndex.wantedContainers(entries, 2, 1L, 10L) == Set(3001L))
  }

  test("rANS order-0 frequency table: consecutive-symbol RLE branch (spec)") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // [sym=65 f=10][sym=66 rle=1 f=20][implicit sym=67 f=30][end]
    val (f1, c1) = formats.CramFormat.ransFreqTable(bytes(65, 10, 66, 1, 20, 30, 0), 0)
    assert(f1(65) == 10 && f1(66) == 20 && f1(67) == 30 && c1 == 7)
    assert(f1.zipWithIndex.collect { case (v, i) if v != 0 => i }.toSeq == Seq(65, 66, 67))
    // no consecutive pair: plain symbol list
    val (f2, c2) = formats.CramFormat.ransFreqTable(bytes(65, 10, 67, 20, 0), 0)
    assert(f2(65) == 10 && f2(67) == 20 && c2 == 5)
    // run of 2 extra symbols then a jump
    val (f3, c3) = formats.CramFormat.ransFreqTable(
      bytes(65, 5, 66, 2, 6, 7, 8, 70, 9, 0), 0)
    assert(f3(65) == 5 && f3(66) == 6 && f3(67) == 7 && f3(68) == 8 && f3(70) == 9)
    assert(c3 == 10)
  }

  test("cram: non-ASCII base bytes fail loudly instead of emitting invalid UTF-8") {
    // the byte-direct bases path (no ISO-8859-1 transcode) would otherwise
    // hand string expressions a UTF8String with bytes >= 0x80 — legal in
    // no base alphabet, so the guard must raise, not silently mangle
    assert(formats.CramFormat.asciiBases("ACGTN=.acgtn*".getBytes).toString ==
      "ACGTN=.acgtn*")
    val e = intercept[IllegalStateException] {
      formats.CramFormat.asciiBases(Array[Byte]('A', 'C', 0xff.toByte, 'G'))
    }
    assert(e.getMessage.contains("non-ASCII base byte 0xff at offset 2"),
      e.getMessage)
  }
}
