package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 split families (GenBank, SDF, FCS, mzML):
  * build a ~10x-gate-scale corpus per format, then time ONE-TASK (forced
  * via a huge openCost) against the SPLIT plan in the same local[N]
  * session — the direct measure of what index-free splitting buys a
  * single big landing file. Prints one line per (format, arm). Run:
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.FormatSplitScale"
  */
object FormatSplitScale {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      sys.env.getOrElse("GRAFT_SPLITSCALE2_DIR", "/tmp/graft_splitscale2"))
    dir.mkdirs()
    val s = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    def gen(name: String)(write: java.io.File => Unit): java.io.File = {
      val f = new java.io.File(dir, name)
      val done = new java.io.File(dir, name + "._done")
      if (!done.exists()) { write(f); done.createNewFile() }
      println(f"corpus $name: ${f.length() / 1e6}%.1f MB")
      f
    }

    // ---- GenBank: 200k records (~10x f75, ~52 MB ≈ 3 chunks at the
    // 16 MiB probe split — chunk-starved). GRAFT_SPLITSCALE2_GENBANK_N=
    // 2000000 gives the ~520 MB / ~32-chunk point where chunk count
    // carries the scaling claim.
    val gbN = sys.env.getOrElse("GRAFT_SPLITSCALE2_GENBANK_N", "200000").toInt
    lazy val gb = gen(if (gbN == 200000) "release.gb" else s"release_$gbN.gb") { f =>
      val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
      val bases = "acgt" * 32
      (0 until gbN).foreach { k =>
        val n = 100 + (k % 7) * 10
        w.write(f"LOCUS       SEQ$k%d             $n%d bp    DNA     linear   CON 24-APR-2019\n")
        w.write(f"ACCESSION   A$k%06d\n")
        w.write("FEATURES             Location/Qualifiers\n")
        w.write(s"     gene            1..$n\n")
        w.write(s"""                     /locus_tag="LT$k"\n""")
        w.write("ORIGIN\n")
        var off = 0
        while (off < n) {
          val take = math.min(60, n - off)
          w.write(f"${off + 1}%9d ${bases.substring(0, take)}\n")
          off += take
        }
        w.write("//\n")
      }
      w.close()
    }

    // ---- SDF: 300k molecules (~10x f76, ~53 MB — same chunk starvation
    // as GenBank). GRAFT_SPLITSCALE2_SDF_N=3000000 for the chunk-rich arm.
    val sdfN = sys.env.getOrElse("GRAFT_SPLITSCALE2_SDF_N", "300000").toInt
    lazy val sdf = gen(if (sdfN == 300000) "mols.sdf" else s"mols_$sdfN.sdf") { f =>
      val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
      (0 until sdfN).foreach { k =>
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

    // ---- FCS: 6M events x 8 params (~192 MB). Past 99,999,999 bytes the
    // 8-char header offset fields can't hold DATA end, so the big-file
    // convention applies: header data fields 0, $BEGINDATA/$ENDDATA in
    // TEXT (readMeta's fallback path — exercised here at the scale that
    // forces it). BEGINDATA depends on the text length which contains its
    // own digits: iterate to the fixpoint.
    // GRAFT_SPLITSCALE2_FCS_N=30000000 gives the ~1 GB / ~60-chunk point.
    val fcsN = sys.env.getOrElse("GRAFT_SPLITSCALE2_FCS_N", "6000000").toInt
    lazy val fcs = gen(if (fcsN == 6000000) "big.fcs" else s"big_$fcsN.fcs") { f =>
      val nEv = fcsN
      def textFor(begin: Long): String =
        "/$PAR/8/$TOT/" + nEv + "/$DATATYPE/F/$BYTEORD/1,2,3,4" +
          "/$P1S/FSC-A/$P2S/SSC-A/$P3S/FL1-A/$P4S/FL2-A/$P5S/FL3-A/$P6S/FL4-A/$P7S/FL5-A/$P8S/TIME" +
          s"/$$BEGINDATA/$begin/$$ENDDATA/${begin + nEv.toLong * 32 - 1}/"
      var dataStart = 58L + textFor(100000000L).length
      dataStart = 58L + textFor(dataStart).length // digit count stabilizes
      val text = textFor(dataStart)
      require(58L + text.length == dataStart, "BEGINDATA fixpoint failed")
      val textStart = 58
      val textEnd = textStart + text.length - 1
      val header =
        f"FCS3.0    $textStart%8d$textEnd%8d${0}%8d${0}%8d${0}%8d${0}%8d"
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

    // ---- mzML: spectra x 50 peaks. Default 80k (~91 MB, ~10x f78); set
    // GRAFT_SPLITSCALE2_MZML_N=800000 for the ~1 GB chunk-rich point where
    // chunk count (not file count) carries the scaling claim — the 91 MB
    // probe had only ~6 chunks at the 16 MiB split size.
    val mzN = sys.env.getOrElse("GRAFT_SPLITSCALE2_MZML_N", "80000").toInt
    lazy val mz = gen(if (mzN == 80000) "big.mzML" else s"big_$mzN.mzML") { f =>
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
      (0 until mzN).foreach { i =>
        val n = 50
        val mzv = Array.tabulate(n)(j => 100.0 + i % 7 + j * 9.97)
        val inten = Array.tabulate(n)(j => ((i * 31 + j * 17) % 10000).toDouble)
        w.write(s"""<spectrum id="scan=$i" index="$i" defaultArrayLength="$n">""")
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

    def timed(label: String, oneTask: Boolean)(body: => Long): Unit = {
      if (oneTask) {
        s.conf.set("spark.sql.files.maxPartitionBytes", "4294967296")
        s.conf.set("spark.sql.files.openCostInBytes", "4294967296")
      } else {
        s.conf.set("spark.sql.files.maxPartitionBytes", "16777216")
        s.conf.set("spark.sql.files.openCostInBytes", "1048576")
      }
      body // warm (also generates page cache on first arm)
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"SPLITSCALE2 $label%-14s ${if (oneTask) "whole" else "split"}%-5s " +
        f"min=${reps.min}%.2f reps=${reps.map(t => f"$t%.2f").mkString(",")}")
    }

    def genbankScan(): Long = s.read.format("genbank").load(gb.getAbsolutePath)
      .agg(count(lit(1)), sum(length(col("sequence")))).collect().length.toLong
    def sdfScan(): Long = s.read.format("sdf").load(sdf.getAbsolutePath)
      .agg(count(lit(1)), sum(col("atom_count")),
        sum(col("data")("id").cast("long"))).collect().length.toLong
    def fcsScan(): Long = s.read.format("fcs").load(fcs.getAbsolutePath)
      .agg(count(lit(1)), sum(col("FSC-A").cast("long"))).collect().length.toLong
    def mzScan(): Long = s.read.format("mzml").load(mz.getAbsolutePath)
      .agg(count(lit(1)),
        sum(expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)")))
      .collect().length.toLong

    val only = sys.env.get("GRAFT_SPLITSCALE2_ONLY")
    def wants(fam: String): Boolean = only.forall(_ == fam)
    if (wants("genbank")) {
      timed(s"genbank_$gbN", oneTask = true)(genbankScan())
      timed(s"genbank_$gbN", oneTask = false)(genbankScan())
    }
    if (wants("sdf")) {
      timed(s"sdf_$sdfN", oneTask = true)(sdfScan())
      timed(s"sdf_$sdfN", oneTask = false)(sdfScan())
    }
    if (wants("fcs")) {
      timed(s"fcs_$fcsN", oneTask = true)(fcsScan())
      timed(s"fcs_$fcsN", oneTask = false)(fcsScan())
    }
    if (wants("mzml")) {
      timed(s"mzml_$mzN", oneTask = true)(mzScan())
      timed(s"mzml_$mzN", oneTask = false)(mzScan())
    }
    s.stop()
  }
}
