package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Failures are recorded per-query in an `errors` map (and the
  * timing is reported as -1), never silently swallowed — a broken query must
  * not masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.buildBench(cpus) // AQE shape documented there

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val queries = SparkEntry.queries
    // Untimed warmup: JVM/codegen/session/FS-metadata costs land here, not on
    // whichever query happens to run first.
    try queries.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => () }

    var errors = Map.empty[String, String]
    // Two timed repetitions, report the min — per-query numbers at small SF
    // are dominated by scheduling noise otherwise.
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // One untimed warm-up rep PER QUERY, then min-of-2 timed: per-query-shape
    // JIT/codegen warm-up otherwise lands on the first timed rep and min-of-2
    // doesn't absorb it (r4's phantom q09/q10 "regressions" were exactly this).
    var results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val w = once(name, fn)
      if (w < 0) name -> -1.0
      else {
        val a = once(name, fn)
        val b = if (a >= 0) once(name, fn) else -1.0
        name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
      }
    }

    // Headline throughput benches mirroring BASELINE.md's query shapes: a
    // full FASTA scan with a predicate over ~|lineitem| sequences (the
    // reference's UniProt-scan shape) and the same scan split across files
    // (the parallel-scan shape). The corpus is generated once from the
    // driver's lineitem table through our own FASTA writer.
    try {
      import org.apache.spark.sql.functions._
      val benchDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        s"graft_bench_fasta_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath
      if (!new java.io.File(benchDir, "_done").exists()) {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        li.select(
            concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("id"),
            lit(null).cast("string").as("description"),
            translate(repeat(sha2(concat_ws("|",
                col("l_orderkey"), col("l_partkey"), col("l_linenumber")), 256), 3),
              "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"))
          .repartition(8)
          .write.format("fasta").mode("overwrite").save(benchDir)
        new java.io.File(benchDir, "_done").createNewFile()
      }
      def timeIt(name: String)(f: => Long): Unit = {
        f // untimed warm-up rep, same policy as the query pack
        val t0 = System.nanoTime()
        f
        results = results :+ (name -> (System.nanoTime() - t0) / 1e9)
      }
      timeIt("b01_fasta_scan_predicate") {
        spark.read.format("fasta").load(benchDir)
          .filter(col("sequence").startsWith("A")).count()
      }
      timeIt("b02_fasta_scan_full") {
        spark.read.format("fasta").load(benchDir)
          .agg(sum(length(col("sequence")))).count()
      }

      // Indexed region query (the baseline's flagship shape): extract a
      // 100-base region from a ~130 MB .fai-indexed reference — time must
      // reflect a byte-range seek, not a file scan.
      val refDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        "graft_bench_faidx").getAbsolutePath
      val refFasta = new java.io.File(refDir, "ref.fasta")
      if (!new java.io.File(refDir, "_done").exists()) {
        new java.io.File(refDir).mkdirs()
        val w = new java.io.BufferedWriter(new java.io.FileWriter(refFasta), 1 << 20)
        (0 until 64).foreach { s =>
          w.write(s">seq$s\n")
          var i = 0
          while (i < 2000000) {
            val n = math.min(60, 2000000 - i)
            val sb = new java.lang.StringBuilder(n)
            var j = 0
            while (j < n) { sb.append("ACGT".charAt((i + j + s) % 4)); j += 1 }
            w.write(sb.toString); w.write("\n")
            i += n
          }
        }
        w.close()
        val hp = new org.apache.hadoop.fs.Path(refFasta.getAbsolutePath)
        graft.sources.FaiIndex.write(
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
        new java.io.File(refDir, "_done").createNewFile()
      }
      timeIt("b03_fasta_fai_region") {
        spark.read.format("fasta").option("region", "seq42:1000001-1000100")
          .load(refFasta.getAbsolutePath).count()
      }

      // Indexed BAM region query (the baseline's second flagship shape):
      // .bai chunk pruning + BGZF virtual seeks on the reference fixture.
      timeIt("b04_bam_bai_region") {
        spark.read.format("bam").option("region", "chr1:1-12209145")
          .load("/root/reference/exon/exon-core/test-data/datasources/bam/test.bam")
          .count()
      }

      // mzML scan (the baseline's ~6k-spectra shape, 0.445 s in BASELINE.md):
      // StAX parse + base64/zlib binary-array decode, one synthetic file.
      val mzDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        "graft_bench_mzml").getAbsolutePath
      val mzFile = new java.io.File(mzDir, "bench.mzML")
      if (!new java.io.File(mzDir, "_done").exists()) {
        new java.io.File(mzDir).mkdirs()
        val w = new java.io.BufferedWriter(new java.io.FileWriter(mzFile), 1 << 20)
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
        (0 until 6000).foreach { i =>
          val n = 100
          val mz = Array.tabulate(n)(j => 100.0 + i % 7 + j * 9.97)
          val inten = Array.tabulate(n)(j => ((i * 31 + j * 17) % 10000).toDouble)
          w.write(s"""<spectrum id="scan=$i" index="$i" defaultArrayLength="$n">""")
          w.write("""<binaryDataArrayList count="2">""")
          w.write("""<binaryDataArray><cvParam accession="MS:1000514" name="m/z array"/>""" +
            """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
            """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
            s"<binary>${b64zlib(mz)}</binary></binaryDataArray>")
          w.write("""<binaryDataArray><cvParam accession="MS:1000515" name="intensity array"/>""" +
            """<cvParam accession="MS:1000523" name="64-bit float"/>""" +
            """<cvParam accession="MS:1000574" name="zlib compression"/>""" +
            s"<binary>${b64zlib(inten)}</binary></binaryDataArray>")
          w.write("</binaryDataArrayList></spectrum>\n")
        }
        w.write("</spectrumList></run></mzML>\n")
        w.close()
        new java.io.File(mzDir, "_done").createNewFile()
      }
      timeIt("b05_mzml_scan") {
        import org.apache.spark.sql.functions.{col, size => asize, sum => asum}
        spark.read.format("mzml").load(mzFile.getAbsolutePath)
          .agg(asum(asize(col("mz.mz")))).count()
      }

      // Same 6k spectra split across 8 files: mzML is non-splittable XML, so
      // a real corpus parallelizes at whole-file granularity — this is the
      // aggregate-throughput story b05's single file can't show.
      val mz8Dir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        "graft_bench_mzml8").getAbsolutePath
      if (!new java.io.File(mz8Dir, "_done").exists()) {
        new java.io.File(mz8Dir).mkdirs()
        val src = scala.io.Source.fromFile(mzFile)
        val lines = try src.getLines().toArray finally src.close()
        // lines: 2 header lines (xml decl + open tags), 6000 spectrum lines, footer
        val header = lines.take(2); val footer = lines.last
        val body = lines.slice(2, lines.length - 1)
        body.grouped((body.length + 7) / 8).zipWithIndex.foreach { case (chunk, i) =>
          val w = new java.io.BufferedWriter(
            new java.io.FileWriter(new java.io.File(mz8Dir, s"part$i.mzML")), 1 << 20)
          header.foreach { l => w.write(l); w.write("\n") }
          chunk.foreach { l => w.write(l); w.write("\n") }
          w.write(footer); w.write("\n")
          w.close()
        }
        new java.io.File(mz8Dir, "_done").createNewFile()
      }
      timeIt("b06_mzml_scan_8files") {
        import org.apache.spark.sql.functions.{col, size => asize, sum => asum}
        spark.read.format("mzml").load(mz8Dir)
          .agg(asum(asize(col("mz.mz")))).count()
      }

      // Indexed VCF region query at scale (the baseline's #1 flagship:
      // 0.936 s on a 2.6 GB tabix-indexed VCF): 2M rows across 32 chroms,
      // bgzip + .tbi produced by our own BgzfWriter/TabixWriter, then a
      // narrow region — time must reflect .tbi chunk seeks, not a scan.
      val vcfDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        "graft_bench_vcfidx").getAbsolutePath
      val vcfFile = new java.io.File(vcfDir, "bench.vcf.gz")
      if (!new java.io.File(vcfDir, "_done").exists()) {
        new java.io.File(vcfDir).mkdirs()
        val names = (0 until 32).map(i => s"chr$i")
        val fos = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(vcfFile), 1 << 20)
        val w = new graft.sources.BgzfWriter(fos)
        val tbi = new graft.sources.TabixWriter(names)
        w.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
          .getBytes("US-ASCII"))
        var r = 0
        while (r < 32) {
          var i = 0
          while (i < 62500) {
            val pos = i * 150 + 1
            val vs = w.virtualPos
            w.write(s"chr$r\t$pos\t.\tA\tG\t5${i % 10}\tPASS\tAC=${i % 7};AN=${r}\n"
              .getBytes("US-ASCII"))
            tbi.add(r, pos - 1, pos, vs, w.virtualPos)
            i += 1
          }
          r += 1
        }
        w.finish()
        fos.close()
        tbi.write(java.nio.file.Paths.get(vcfDir, "bench.vcf.gz.tbi"))
        new java.io.File(vcfDir, "_done").createNewFile()
      }
      timeIt("b08_vcf_tabix_region") {
        spark.read.format("vcf").option("region", "chr20:3000000-3030000")
          .load(vcfFile.getAbsolutePath).count()
      }
    } catch {
      case e: Throwable =>
        errors += "b0x_fasta_bench" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
    }

    // b07: parallel-scan scaling curve, mirroring the baseline's workers-N
    // sweep over the 8-file FASTA corpus (exon-benchmarks: 6.29 s @1 ->
    // 1.73 s @8). local[N] caps the executor threads, so the curve measures
    // whether the 8 splits actually parallelize. Each width needs its own
    // SparkContext (one context per JVM), so this runs last: stop the main
    // session, cycle local[1/2/4/8] sessions over the same corpus.
    try {
      val benchDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        s"graft_bench_fasta_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath
      // The b02 corpus scans in ~0.3 s at one worker — fixed job overhead
      // would flatten the curve. The scaling corpus replicates it 6x (~3.6M
      // records, still 8 files) so per-worker scan time dominates, matching
      // the baseline sweep's seconds-long single-worker shape.
      val scaleDir = new java.io.File(sys.props.get("java.io.tmpdir").getOrElse("/tmp"),
        s"graft_bench_fasta6x_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}").getAbsolutePath
      if (new java.io.File(benchDir, "_done").exists()) {
        if (!new java.io.File(scaleDir, "_done").exists()) {
          import org.apache.spark.sql.functions._
          val one = spark.read.format("fasta").load(benchDir)
          (0 until 6).map(i => one.withColumn("id", concat_ws("_", lit(i), col("id"))))
            .reduce(_ unionAll _)
            .repartition(8)
            .write.format("fasta").mode("overwrite").save(scaleDir)
          new java.io.File(scaleDir, "_done").createNewFile()
        }
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        Seq(1, 2, 4, 8).foreach { w =>
          val s = LocalSession.buildBench(w.toString)
          import org.apache.spark.sql.functions._
          def scan(): Long = s.read.format("fasta").load(scaleDir)
            .agg(sum(length(col("sequence")))).count()
          scan() // warm-up, same policy as the query pack
          val t0 = System.nanoTime()
          scan()
          results = results :+ (s"b07_fasta_scan_w$w" -> (System.nanoTime() - t0) / 1e9)
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
      }
    } catch {
      case e: Throwable =>
        errors += "b07_scaling" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
    }
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.toSeq.sortBy(_._1).map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(0) // errors are in the JSON; exit clean
  }
}
