package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SharedSpark

/** Randomized split-vs-whole invariance across every text split family.
  *
  * The per-format split specs sweep HANDCRAFTED cut offsets (every critical
  * in-record position on byte-identical records). This spec is the breadth
  * complement: records with seeded-RANDOM lengths and adversarial content —
  * FASTQ quality lines opening with '@'/'+', SDF molecule names opening
  * with '>', data values whose lines END in "$$$$", GenBank qualifier text
  * containing the words LOCUS and "//", mzML attribute values containing
  * '>' and self-closed spectra — then 4 random split sizes per format, each
  * asserted row-identical (full-row to_json compare) against the whole-file
  * plan. Content and cut sizes come from a fixed seed, so a failure
  * reproduces exactly; anything this finds is a missing case for the
  * format's own spec.
  */
class SplitFuzzSpec extends AnyFunSuite with SharedSpark {

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def writeFile(name: String, text: String): java.io.File = {
    val dir = graft.TestTmp.dir("split_fuzz")
    val f = new java.io.File(dir.toFile, name)
    val w = new java.io.FileWriter(f)
    w.write(text); w.close()
    f
  }

  /** Whole-file rows == split rows at 4 seeded-random split sizes. The
    * whole-file arm is MATERIALIZED (collected) before the conf changes —
    * comparing against a lazy DataFrame would let it re-plan under the
    * split conf and turn the check into split-vs-split.
    */
  private def assertInvariant(fmt: String, f: java.io.File, nRows: Long,
                              rng: scala.util.Random): Unit = {
    def read(): DataFrame =
      spark.read.format(fmt).load(f.getAbsolutePath)
        .selectExpr("to_json(struct(*)) AS row_json")
    val whole = read()
    assert(whole.rdd.getNumPartitions == 1, s"$fmt: corpus split at default conf")
    val wholeRows = whole.collect().map(_.getString(0)).sorted
    assert(wholeRows.length == nRows, s"$fmt: whole-file row count")
    val size = f.length()
    (1 to 4).foreach { _ =>
      val target = size / 6 + rng.nextInt((size / 8).toInt).toLong
      withConf(
        "spark.sql.files.maxPartitionBytes" -> target.toString,
        "spark.sql.files.openCostInBytes" -> (target / 4).toString) {
        val split = read()
        val parts = split.rdd.getNumPartitions
        assert(parts >= 3, s"$fmt: split did not engage at $target: $parts part(s)")
        val splitRows = split.collect().map(_.getString(0)).sorted
        assert(splitRows.length == nRows, s"$fmt: split row count at $target")
        assert(java.util.Arrays.equals(
          splitRows.asInstanceOf[Array[AnyRef]], wholeRows.asInstanceOf[Array[AnyRef]]),
          s"$fmt: split rows differ from whole-file rows at $target")
      }
    }
  }

  private val bases = "ACGTN"
  private def seq(rng: scala.util.Random, n: Int): String =
    (0 until n).map(_ => bases(rng.nextInt(bases.length))).mkString

  test("fasta: random record/line lengths, '>' in descriptions") {
    val rng = new scala.util.Random(4201)
    val sb = new StringBuilder
    val n = 1500
    (0 until n).foreach { k =>
      val desc =
        if (rng.nextInt(4) == 0) s"desc >inner gt $k len=${rng.nextInt(100)}"
        else s"plain $k"
      sb.append(s">id$k $desc\n")
      val len = 20 + rng.nextInt(400)
      val width = 30 + rng.nextInt(50)
      val s = seq(rng, len)
      s.grouped(width).foreach(chunk => sb.append(chunk).append('\n'))
    }
    assertInvariant("fasta", writeFile("fuzz.fasta", sb.toString), n, rng)
  }

  test("fastq: quality lines opening with '@' and '+', random lengths") {
    val rng = new scala.util.Random(4202)
    val sb = new StringBuilder
    val n = 3000
    (0 until n).foreach { k =>
      val len = 20 + rng.nextInt(180)
      // qualities drawn to often START with '@' or '+' — the classic
      // 4-line resync trap a naive '@'-scan would mis-align on
      val qual = (0 until len).map { i =>
        if (i == 0 && rng.nextBoolean()) (if (rng.nextBoolean()) '@' else '+')
        else ('!' + rng.nextInt(60)).toChar
      }.mkString
      sb.append(s"@read$k comment $k\n").append(seq(rng, len)).append('\n')
        .append(if (rng.nextBoolean()) s"+read$k\n" else "+\n")
        .append(qual).append('\n')
    }
    assertInvariant("fastq", writeFile("fuzz.fastq", sb.toString), n, rng)
  }

  test("genbank: random sections, LOCUS/'//' inside qualifier text") {
    val rng = new scala.util.Random(4203)
    val sb = new StringBuilder
    val n = 800
    (0 until n).foreach { k =>
      val bp = 60 + rng.nextInt(300)
      sb.append(f"LOCUS       FZ$k%05d             $bp%d bp    DNA     linear   CON 01-JAN-2020\n")
      if (rng.nextBoolean()) sb.append(s"ACCESSION   FZ$k\n")
      if (rng.nextInt(3) == 0)
        sb.append("DEFINITION  mentions LOCUS and // inside body text\n")
          .append("            continuation line of the definition.\n")
      sb.append("FEATURES             Location/Qualifiers\n")
      (0 to rng.nextInt(3)).foreach { g =>
        sb.append(s"     gene            ${g + 1}..$bp\n")
        sb.append(s"""                     /note="has LOCUS word and // slashes $k"\n""")
        if (rng.nextBoolean())
          sb.append(s"""                     /locus_tag="LT${k}_$g"\n""")
      }
      sb.append("ORIGIN\n")
      val s = seq(rng, bp).toLowerCase
      var off = 0
      while (off < bp) {
        val take = math.min(60, bp - off)
        sb.append(f"${off + 1}%9d ${s.substring(off, off + take).grouped(10).mkString(" ")}\n")
        off += take
      }
      sb.append("//\n")
      if (rng.nextInt(5) == 0) sb.append("\n") // blank gap between records
    }
    assertInvariant("genbank", writeFile("fuzz.gb", sb.toString), n, rng)
  }

  test("sdf: names opening with '>', value lines ending in $$$$, random sizes") {
    val rng = new scala.util.Random(4204)
    val sb = new StringBuilder
    val n = 1200
    (0 until n).foreach { k =>
      // record 0 stays plain so driver-side schema inference (first record)
      // sees the real <id> data key in both arms
      val name =
        if (k > 0 && rng.nextInt(5) == 0) s"> <decoy>$k" // a data header in BOTH paths
        else s"MOL$k"
      sb.append(name).append('\n').append("  FUZZ\n").append(s"comment $k\n")
      val atoms = 1 + rng.nextInt(5)
      sb.append(f"$atoms%3d  1  0  0  0  0  0  0  0  0999 V2000\n")
      (0 until atoms).foreach { a =>
        sb.append(f"    $a%d.0000    0.0000    0.0000 C\n")
      }
      sb.append("  1  2  1  0\nM  END\n")
      sb.append("> <id>\n").append(f"$k%06d\n\n")
      if (rng.nextInt(4) == 0) {
        // a long value line ENDING in $$$$ — not a terminator (content
        // before it survives trim), and long enough to stress lookback
        sb.append("> <trap>\n")
          .append("x" * (60 + rng.nextInt(120))).append("   $$$$\n\n")
      }
      sb.append("$$$$\n")
    }
    assertInvariant("sdf", writeFile("fuzz.sdf", sb.toString), n, rng)
  }

  // ---- binary resync families: fuzz through the engine's own sinks ----
  // Variable read lengths, hash-derived tag presence and a no-coor tail
  // (BAM) exercise the BGZF/container resync alignment on record shapes
  // the handcrafted resync specs keep constant. Indexes are deleted so the
  // split plan must resync, not prune.

  import org.apache.spark.sql.functions._

  private def fuzzReads(n: Long, maxLen: Int) = {
    val len = (pmod(hash(col("id")), lit(maxLen - 20)) + lit(20)).cast("int")
    val seq128 = translate(concat(
      md5(col("id").cast("string")), md5((col("id") + n).cast("string")),
      md5((col("id") + 2 * n).cast("string")), md5((col("id") + 3 * n).cast("string"))),
      "0123456789abcdef", "ACGTACGTACGTACGT")
    spark.range(0, n).select(
      concat(lit("r"), col("id")).as("name"),
      lit(0).as("flag"),
      concat(lit("chr"), (col("id") % 4).cast("string")).as("reference"),
      ((col("id") / 4).cast("long") * 200 + 1).as("start"),
      ((col("id") / 4).cast("long") * 200 + len - 1).as("end"),
      lit("30").as("mapping_quality"),
      concat(len.cast("string"), lit("M")).as("cigar"),
      lit(null).cast("string").as("mate_reference"),
      substring(seq128, 1, 512).substr(lit(1), len).as("sequence"),
      array_repeat(lit(30L), len).as("quality_score"),
      when(pmod(hash(col("id"), lit(7)), lit(3)) === 0,
        array(struct(lit("NM").as("tag"),
          pmod(hash(col("id"), lit(11)), lit(9)).cast("string").as("value"))))
        .otherwise(array().cast("array<struct<tag:string,value:string>>"))
        .as("tags"))
  }

  private def writeSorted(df: org.apache.spark.sql.DataFrame, fmt: String,
                          dirName: String, extraOpts: (String, String)*): java.io.File = {
    val dir = graft.TestTmp.dir(dirName).toString + "/t"
    val refs = (0 until 4).map(i => s"chr$i:40000000").mkString(",")
    val w = df
      .repartitionByRange(1, col("reference").asc_nulls_last, col("start").asc_nulls_last)
      .sortWithinPartitions(col("reference").asc_nulls_last, col("start").asc_nulls_last)
      .write.format(fmt).mode("overwrite").option("refs", refs)
    extraOpts.foldLeft(w) { case (ww, (k, v)) => ww.option(k, v) }.save(dir)
    // delete indexes: the split plan must resync, not prune
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".bai") || f.getName.endsWith(".crai"))
      .foreach(f => assert(f.delete()))
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith("." + fmt)).minBy(_.getName)
  }

  test("bam: variable-length reads, hash-derived tags, no-coor tail; resync splits") {
    val rng = new scala.util.Random(4206)
    val n = 30000L
    val noCoor = spark.range(0, 37).select(
      concat(lit("u"), col("id")).as("name"),
      lit(4).as("flag"),
      lit(null).cast("string").as("reference"),
      lit(null).cast("long").as("start"),
      lit(null).cast("long").as("end"),
      lit(null).cast("string").as("mapping_quality"),
      lit(null).cast("string").as("cigar"),
      lit(null).cast("string").as("mate_reference"),
      lit("ACGT").as("sequence"),
      array_repeat(lit(30L), 4).as("quality_score"),
      array().cast("array<struct<tag:string,value:string>>").as("tags"))
    val f = writeSorted(fuzzReads(n, 120).unionAll(noCoor), "bam", "fuzz_bam")
    assertInvariant("bam", f, n + 37, rng)
  }

  test("cram: variable-length reads, hash-derived tags, random container fill; resync splits") {
    val rng = new scala.util.Random(4207)
    val n = 30000L
    val f = writeSorted(fuzzReads(n, 120), "cram", "fuzz_cram",
      "containerRecords" -> "700")
    assertInvariant("cram", f, n, rng)
  }

  test("bcf: hash-randomized ids/alts/quals/info/formats; BGZF resync splits") {
    val rng = new scala.util.Random(4209)
    val dir = graft.TestTmp.dir("fuzz_bcf").toFile
    val header = new java.io.File(dir, "header.vcf")
    java.nio.file.Files.writeString(header.toPath,
      """##fileformat=VCFv4.3
        |##contig=<ID=chrA,length=100000000>
        |##contig=<ID=chrB,length=100000000>
        |##FILTER=<ID=PASS,Description="ok">
        |##FILTER=<ID=q10,Description="low">
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">
        |##INFO=<ID=AF,Number=A,Type=Float,Description="freq">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="genotype">
        |##FORMAT=<ID=DP,Number=1,Type=Integer,Description="depth">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	s1	s2
        |""".stripMargin)
    val n = 40000L
    def h(salt: Int) = pmod(hash(col("id"), lit(salt)), lit(1000))
    val rows = spark.range(0, n).select(
      when(col("id") % 2 === 0, "chrA").otherwise("chrB").as("chrom"),
      ((col("id") / 2).cast("long") * 29 + 7).as("pos"),
      when(h(1) < 300, array(concat(lit("rs"), col("id").cast("string"))))
        .otherwise(lit(null).cast("array<string>")).as("id"),
      lit("A").as("ref"),
      when(h(2) < 400, array(lit("T"), lit("G"))).otherwise(array(lit("C"))).as("alt"),
      when(h(3) < 150, lit(null).cast("float"))
        .otherwise(h(4).cast("float") / 10.0f).as("qual"),
      when(h(5) < 250, array(lit("q10"))).otherwise(array(lit("PASS"))).as("filter"),
      concat(lit("DP="), h(6).cast("string"),
        when(h(2) < 400, lit(";AF=0.25,0.75")).otherwise(lit(";AF=0.5"))).as("info"),
      concat(lit("GT:DP\t0/1:"), h(7).cast("string"),
        lit("\t1/1:"), h(8).cast("string")).as("formats"))
      .repartitionByRange(1, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
    val out = new java.io.File(dir, "t").getAbsolutePath
    rows.write.format("bcf").mode("overwrite")
      .option("headerFrom", header.getAbsolutePath).save(out)
    new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csi")).foreach(f => assert(f.delete()))
    val bcf = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".bcf")).minBy(_.getName)
    assertInvariant("bcf", bcf, n, rng)
  }

  test("fcs: random parameter count, both byte orders, random values; stride splits") {
    val rng = new scala.util.Random(4208)
    val nPar = 3 + rng.nextInt(8)
    val nEv = 200000 + rng.nextInt(100000)
    val bigEndian = rng.nextBoolean()
    val names = (1 to nPar).map(i => s"FZ$i-A")
    val text = "/$PAR/" + nPar + "/$TOT/" + nEv + "/$DATATYPE/F" +
      "/$BYTEORD/" + (if (bigEndian) "4,3,2,1" else "1,2,3,4") +
      names.zipWithIndex.map { case (nm, i) => s"/$$P${i + 1}S/$nm" }.mkString + "/"
    val textStart = 58
    val textEnd = textStart + text.length - 1
    val dataStart = textEnd + 1
    val dataEnd = dataStart + nEv.toLong * nPar * 4 - 1
    val header = f"FCS3.0    $textStart%8d$textEnd%8d$dataStart%8d$dataEnd%8d${0}%8d${0}%8d"
    val dir = graft.TestTmp.dir("split_fuzz")
    val f = new java.io.File(dir.toFile, "fuzz.fcs")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 20)
    out.write(header.getBytes("US-ASCII")); out.write(text.getBytes("US-ASCII"))
    val bb = java.nio.ByteBuffer.allocate(nPar * 4).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nEv).foreach { _ =>
      bb.clear()
      (0 until nPar).foreach(_ => bb.putFloat(rng.nextInt(1 << 14).toFloat))
      out.write(bb.array())
    }
    out.close()
    assertInvariant("fcs", f, nEv, rng)
  }

  test("mzml: '>' in attribute values, self-closed spectra, random peaks") {
    val rng = new scala.util.Random(4205)
    def b64(vals: Array[Double]): String = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<mzML><run><spectrumList>\n")
    val n = 900
    (0 until n).foreach { i =>
      if (rng.nextInt(7) == 0) {
        sb.append(s"""<spectrum id="scan=$i q>r" index="$i" defaultArrayLength="0"/>\n""")
      } else {
        val np = 1 + rng.nextInt(40)
        val mzv = Array.tabulate(np)(j => 100.0 + i % 13 + j * 7.7)
        sb.append(s"""<spectrum id="scan=$i a>b" index="$i" defaultArrayLength="$np">""")
          .append("""<binaryDataArrayList count="1">""")
          .append("""<binaryDataArray><cvParam accession="MS:1000514" name="m/z array"/>""")
          .append("""<cvParam accession="MS:1000523" name="64-bit float"/>""")
          .append("""<cvParam accession="MS:1000576" name="no compression"/>""")
          .append(s"<binary>${b64(mzv)}</binary></binaryDataArray>")
          .append("</binaryDataArrayList></spectrum>\n")
      }
      if (rng.nextInt(11) == 0)
        sb.append(s"<!-- comment with <spectrum inside, index $i -->\n")
    }
    sb.append("</spectrumList></run></mzML>\n")
    assertInvariant("mzml", writeFile("fuzz.mzML", sb.toString), n, rng)
  }
}
