package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared synthetic corpora used by both the bench (b15) and the scale
  * ratchet (SplitScale) — one definition so a shape tweak can't silently
  * diverge what the two measure.
  */
object Corpora {

  /** ONE unindexed bgzipped VCF under `dir/calls.vcf.gz` (landing-zone
    * shape: bgzip without tabix): `rows` sorted rows through the vcf sink
    * as a single shard, then the `.tbi` sibling stripped. INFO carries an
    * md5 field so the file doesn't deflate to nothing. Guarded by a
    * `_done` marker.
    */
  def writeUnindexedVcfGz(spark: SparkSession, dir: String, rows: Long): Unit = {
    if (new java.io.File(dir, "_done").exists()) return
    new java.io.File(dir).mkdirs()
    val sink = s"$dir/sink"
    spark.range(0, rows).select(
        concat(lit("chr"), (col("id") % 8).cast("string")).as("chrom"),
        ((col("id") / 8).cast("long") * 40 + 1).as("pos"),
        lit(null).cast("array<string>").as("id"),
        lit("A").as("ref"),
        array(lit("T")).as("alt"),
        (col("id") % 60).cast("float").as("qual"),
        lit(null).cast("array<string>").as("filter"),
        concat(lit("DP="), (col("id") % 100).cast("string"),
          lit(";H="), md5(col("id").cast("string"))).as("info"),
        lit(null).cast("string").as("formats"))
      .repartitionByRange(1, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .write.format("vcf").mode("overwrite")
      .option("compression", "bgzf").save(sink)
    new java.io.File(sink).listFiles()
      .filter(_.getName.endsWith(".vcf.gz")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dir, "calls.vcf.gz").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    new java.io.File(dir, "_done").createNewFile()
  }

  /** ONE bgzipped FASTQ under `dir/t/reads.fastq.gz` (the b18 sequencer
    * landing shape: bgzip, no index possible for FASTQ at all): `rows`
    * records with 90-base md5-derived sequences and quality strings whose
    * first char is '@' on every third record (the resync validator's
    * adversarial case), written through the fastq sink then BGZF-
    * recompressed. Guarded by a `_done` marker.
    */
  def writeUnindexedFastqBgzf(spark: SparkSession, dir: String, rows: Long): Unit = {
    if (new java.io.File(dir, "_done").exists()) return
    new java.io.File(dir).mkdirs()
    val n = rows
    spark.range(0, n).select(
        concat(lit("read"), col("id")).as("name"),
        lit(null).cast("string").as("description"),
        translate(substring(concat(md5(col("id").cast("string")),
            md5((col("id") + n).cast("string")),
            md5((col("id") + 2 * n).cast("string"))), 1, 90),
          "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
        concat(when(col("id") % 3 === 0, lit("@")).otherwise(lit("E")),
          substring(translate(substring(concat(
              md5((col("id") + 3 * n).cast("string")),
              md5((col("id") + 4 * n).cast("string")),
              md5((col("id") + 5 * n).cast("string"))), 1, 90),
            "0123456789abcdef", "!#$%&'()*+,-./:;"), 2, 89))
          .as("quality_scores"))
      .repartition(1)
      .write.format("fastq").mode("overwrite").save(s"$dir/sink")
    val part = new java.io.File(s"$dir/sink").listFiles()
      .filter(_.getName.endsWith(".fastq")).head
    val t = new java.io.File(dir, "t")
    t.mkdirs()
    val gz = new java.io.File(t, "reads.fastq.gz")
    val fos = new java.io.FileOutputStream(gz)
    val w = new graft.sources.BgzfWriter(
      new java.io.BufferedOutputStream(fos, 1 << 16))
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(part), 1 << 16)
    try {
      val buf = new Array[Byte](1 << 16)
      var r = in.read(buf)
      while (r > 0) { w.write(buf, 0, r); r = in.read(buf) }
      w.finish()
    } finally { in.close(); fos.close() }
    // the plain sink shard is scratch; the corpus is the bgzf copy
    new java.io.File(s"$dir/sink").listFiles().foreach(_.delete())
    new java.io.File(dir, "_done").createNewFile()
  }

  // ---------------------------------------------------------------------
  // Plain-JVM writers for the DecodeRate probe (same record shapes as the
  // FormatSplitScale ratchet corpora, parameterized by record count so the
  // decode-rate gate and the split ratchet can't drift apart in content).
  // ---------------------------------------------------------------------

  private def guarded(f: java.io.File)(write: => Unit): Unit = {
    val done = new java.io.File(f.getParentFile, f.getName + "._done")
    f.getParentFile.mkdirs()
    if (!done.exists()) { write; done.createNewFile() }
  }

  def writeGenBank(f: java.io.File, n: Int): Unit = guarded(f) {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val bases = "acgt" * 32
    (0 until n).foreach { k =>
      val len = 100 + (k % 7) * 10
      w.write(f"LOCUS       SEQ$k%d             $len%d bp    DNA     linear   CON 24-APR-2019\n")
      w.write(f"ACCESSION   A$k%06d\n")
      w.write("FEATURES             Location/Qualifiers\n")
      w.write(s"     gene            1..$len\n")
      w.write(s"""                     /locus_tag="LT$k"\n""")
      w.write("ORIGIN\n")
      var off = 0
      while (off < len) {
        val take = math.min(60, len - off)
        w.write(f"${off + 1}%9d ${bases.substring(0, take)}\n")
        off += take
      }
      w.write("//\n")
    }
    w.close()
  }

  def writeSdf(f: java.io.File, n: Int): Unit = guarded(f) {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    (0 until n).foreach { k =>
      w.write(f"MOL$k%06d\n  SYNTH\ncomment\n")
      w.write("  2  1  0  0  0  0  0  0  0  0999 V2000\n")
      w.write("    0.0000    0.0000    0.0000 C\n")
      w.write("    1.0000    0.0000    0.0000 O\n")
      w.write("  1  2  1  0\nM  END\n> <id>\n")
      w.write(f"$k%06d\n\n")
      w.write("$$$$\n")
    }
    w.close()
  }

  /** FCS with the big-file header convention ($BEGINDATA/$ENDDATA in TEXT)
    * — same fixpoint construction as FormatSplitScale's generator.
    */
  def writeFcs(f: java.io.File, nEv: Int): Unit = guarded(f) {
    def textFor(begin: Long): String =
      "/$PAR/8/$TOT/" + nEv + "/$DATATYPE/F/$BYTEORD/1,2,3,4" +
        "/$P1S/FSC-A/$P2S/SSC-A/$P3S/FL1-A/$P4S/FL2-A/$P5S/FL3-A/$P6S/FL4-A/$P7S/FL5-A/$P8S/TIME" +
        s"/$$BEGINDATA/$begin/$$ENDDATA/${begin + nEv.toLong * 32 - 1}/"
    var dataStart = 58L + textFor(100000000L).length
    dataStart = 58L + textFor(dataStart).length
    val text = textFor(dataStart)
    require(58L + text.length == dataStart, "BEGINDATA fixpoint failed")
    val textStart = 58
    val textEnd = textStart + text.length - 1
    val header = f"FCS3.0    $textStart%8d$textEnd%8d${0}%8d${0}%8d${0}%8d${0}%8d"
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 20))
    out.writeBytes(header); out.writeBytes(text)
    var i = 0
    while (i < nEv) {
      var p = 0
      while (p < 8) {
        out.writeInt(Integer.reverseBytes(java.lang.Float.floatToIntBits(
          ((i * 7 + p * 3) % 16381).toFloat)))
        p += 1
      }
      i += 1
    }
    out.close()
  }

  /** Wide-spectrum mzML (np peaks per array): the profile-shape where the
    * zlib wall lives in big blobs — MS1 survey scans carry 10k-100k peaks
    * per array, vs the 50-peak b05 shape whose per-spectrum overheads
    * dominate. Same deterministic construction as [[writeMzml]].
    */
  def writeMzmlWide(f: java.io.File, n: Int, np: Int): Unit = guarded(f) {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    def b64zlib(vals: Array[Double]): String = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val defl = new java.util.zip.Deflater()
      defl.setInput(bb.array()); defl.finish()
      val out = new java.io.ByteArrayOutputStream(vals.length * 8)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      defl.end()
      java.util.Base64.getEncoder.encodeToString(out.toByteArray)
    }
    w.write("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<mzML><run><spectrumList>\n")
    (0 until n).foreach { i =>
      val mzv = Array.tabulate(np)(j => 100.0 + i % 7 + j * 9.97)
      val inten = Array.tabulate(np)(j => ((i * 31 + j * 17) % 10000).toDouble)
      w.write(s"""<spectrum id="scan=$i" index="$i" defaultArrayLength="$np">""")
      w.write("""<binaryDataArrayList count="2">""")
      w.write("""<binaryDataArray><cvParam accession="MS:1000514" name="m/z array"/>""" +
        """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
        """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
        s"<binary>${b64zlib(mzv)}</binary></binaryDataArray>")
      w.write("""<binaryDataArray><cvParam accession="MS:1000515" name="intensity array"/>""" +
        """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
        """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
        s"<binary>${b64zlib(inten)}</binary></binaryDataArray>")
      w.write("</binaryDataArrayList></spectrum>\n")
    }
    w.write("</spectrumList></run></mzML>\n")
    w.close()
  }

  def writeMzml(f: java.io.File, n: Int): Unit = guarded(f) {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    def b64zlib(vals: Array[Double]): String = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val defl = new java.util.zip.Deflater()
      defl.setInput(bb.array()); defl.finish()
      val out = new java.io.ByteArrayOutputStream(vals.length * 8)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      defl.end()
      java.util.Base64.getEncoder.encodeToString(out.toByteArray)
    }
    w.write("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<mzML><run><spectrumList>\n")
    (0 until n).foreach { i =>
      val np = 50
      val mzv = Array.tabulate(np)(j => 100.0 + i % 7 + j * 9.97)
      val inten = Array.tabulate(np)(j => ((i * 31 + j * 17) % 10000).toDouble)
      w.write(s"""<spectrum id="scan=$i" index="$i" defaultArrayLength="$np">""")
      w.write("""<binaryDataArrayList count="2">""")
      w.write("""<binaryDataArray><cvParam accession="MS:1000514" name="m/z array"/>""" +
        """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
        """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
        s"<binary>${b64zlib(mzv)}</binary></binaryDataArray>")
      w.write("""<binaryDataArray><cvParam accession="MS:1000515" name="intensity array"/>""" +
        """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
        """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
        s"<binary>${b64zlib(inten)}</binary></binaryDataArray>")
      w.write("</binaryDataArrayList></spectrum>\n")
    }
    w.write("</spectrumList></run></mzML>\n")
    w.close()
  }
}
