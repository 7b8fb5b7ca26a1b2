package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** BGZF + tabix writer round trip: files from [[BgzfWriter]]/[[TabixWriter]]
  * must decode through the fixture-proven readers, and region reads through
  * the self-written `.tbi` must agree exactly with a row-filtered full scan
  * while touching only a small slice of the file.
  */
class BgzfWriterSpec extends AnyFunSuite with SharedSpark {

  test("bgzf+tbi round trip: region reads agree with full-scan filter, chunks prune") {
    val dir = graft.TestTmp.dir("graft_bgzfw")
    val vcf = dir.resolve("synth.vcf.gz")
    val names = Seq("chr1", "chr2", "chr3")
    val fos = java.nio.file.Files.newOutputStream(vcf)
    val w = new BgzfWriter(fos)
    val tbi = new TabixWriter(names)
    w.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
      .getBytes("US-ASCII"))
    for (r <- names.indices; i <- 0 until 100000) {
      val pos = i * 300 + 1 + r * 7
      val vs = w.virtualPos
      w.write(s"${names(r)}\t$pos\t.\tA\tG\t50\tPASS\tAC=${i % 5}\n".getBytes("US-ASCII"))
      tbi.add(r, pos - 1, pos, vs, w.virtualPos)
    }
    w.finish()
    fos.close()
    tbi.write(dir.resolve("synth.vcf.gz.tbi"))

    val full = spark.read.format("vcf").load(vcf.toString)
    assert(full.count() == 300000)
    val got = spark.read.format("vcf").option("region", "chr2:1000000-1030000")
      .load(vcf.toString).count()
    val exp = full.filter(col("chrom") === "chr2" && col("pos").between(1000000L, 1030000L))
      .count()
    assert(got == exp && got > 0, s"region=$got filter=$exp")

    // the narrow region's chunk set must cover a small fraction of the file
    val idx = TabixIndex.read(
      new org.apache.hadoop.fs.Path(dir.resolve("synth.vcf.gz.tbi").toString),
      new org.apache.hadoop.conf.Configuration())
    assert(idx.names == names)
    val chunks = idx.query("chr2", 999999L, 1030000L)
    val spanned = chunks.map { case (s, e) => (e >> 16) - (s >> 16) + 65536 }.sum
    assert(chunks.nonEmpty && spanned < java.nio.file.Files.size(vcf) / 5,
      s"chunks $chunks span $spanned of ${java.nio.file.Files.size(vcf)}")
  }

  test("index pruning over a many-file directory fans out concurrently and stays exact") {
    val dir = graft.TestTmp.dir("graft_parallel_prune")
    val names = Seq("chrA", "chrB")
    (0 until 24).foreach { f =>
      val vcf = dir.resolve(f"part$f%02d.vcf.gz")
      val fos = java.nio.file.Files.newOutputStream(vcf)
      val w = new BgzfWriter(fos)
      val tbi = new TabixWriter(names)
      w.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        .getBytes("US-ASCII"))
      for (r <- names.indices; i <- 0 until 2000) {
        val pos = i * 100 + 1
        val vs = w.virtualPos
        w.write(s"${names(r)}\t$pos\t.\tA\tG\t50\tPASS\tAC=$f\n".getBytes("US-ASCII"))
        tbi.add(r, pos - 1, pos, vs, w.virtualPos)
      }
      w.finish()
      fos.close()
      tbi.write(dir.resolve(f"part$f%02d.vcf.gz.tbi"))
    }
    GraftScan.maxConcurrentIndexLookups.set(0)
    val got = spark.read.format("vcf").option("region", "chrB:5001-20000")
      .load(dir.toString).count()
    val exp = spark.read.format("vcf").load(dir.toString)
      .filter(col("chrom") === "chrB" && col("pos").between(5001L, 20000L)).count()
    assert(got == exp && got > 0, s"region=$got filter=$exp")
    // the per-file .tbi queries must have overlapped (bounded-pool fan-out),
    // not run as a serial driver loop
    assert(GraftScan.maxConcurrentIndexLookups.get() > 1,
      s"max concurrent index lookups = ${GraftScan.maxConcurrentIndexLookups.get()}")
  }

  test("bgzf blocks carry BSIZE and the EOF marker; multi-block files split cleanly") {
    val dir = graft.TestTmp.dir("graft_bgzfw2")
    val p = dir.resolve("blocks.bin.gz")
    val fos = java.nio.file.Files.newOutputStream(p)
    val w = new BgzfWriter(fos)
    val line = ("x" * 99 + "\n").getBytes("US-ASCII")
    (0 until 3000).foreach(_ => w.write(line)) // ~300 KB > several blocks
    w.finish()
    fos.close()
    val bytes = java.nio.file.Files.readAllBytes(p)
    // trailing EOF member present
    assert(bytes.takeRight(28).sameElements(BgzfWriter.Eof))
    // first member header declares a BSIZE matching a well-formed block
    assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
    assert(bytes(12) == 'B' && bytes(13) == 'C')
    // whole file decodes through the multi-member gzip path
    val in = new MultiMemberGzipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val all = try in.readAllBytes() finally in.close()
    assert(all.length == 100 * 3000)
  }

  test("VCF recordRegion spans the REF allele and honors INFO END (tabix preset)") {
    import graft.sources.formats.VcfFormat
    def region(pos: Long, ref: String, info: String): (String, Long, Long) =
      VcfFormat.recordRegion(Array[Any](
        "chr1", pos, null, ref, null, null, null, info, null))

    // SNP: 1-base span, unchanged semantics
    assert(region(100, "A", "AC=1") == (("chr1", 99L, 100L)))
    // 10-base deletion: end = pos + len(ref) - 1
    assert(region(100, "AACGTACGTA", "AC=1") == (("chr1", 99L, 109L)))
    // symbolic SV: INFO END wins
    assert(region(100, "A", "SVTYPE=DEL;END=5000") == (("chr1", 99L, 5000L)))
    assert(region(100, "A", "END=5000;SVTYPE=DEL") == (("chr1", 99L, 5000L)))
    // SVEND= / GENE_END= must NOT be mistaken for END=
    assert(region(100, "A", "SVEND=9999") == (("chr1", 99L, 100L)))
    assert(region(100, "A", "GENE_END=9999;AC=2") == (("chr1", 99L, 100L)))
    // END= with a non-numeric value or mid-token stop is ignored
    assert(region(100, "A", "END=abc") == (("chr1", 99L, 100L)))
    // END before POS (malformed) falls back to the REF span
    assert(region(100, "ACG", "END=50") == (("chr1", 99L, 102L)))
    // null REF/INFO degrade to the 1-base span
    assert(region(100, null, null) == (("chr1", 99L, 100L)))
  }
}
