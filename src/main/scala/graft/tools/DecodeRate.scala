package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-task decode-rate regression gate (VERDICT r14 item #4).
  *
  * The per-core MB/s table in BENCH_NOTES_r14 §1 is the most scale-relevant
  * signal the repo has — FCS sat at a 20 MB/s single-core wall for 13
  * rounds because nothing measured it mechanically. This main measures it:
  * for each format family, ONE whole-file scan task (split planning
  * disabled via huge maxPartitionBytes/openCost, so the decode runs on one
  * core regardless of the session's thread count) over a ~100-200 MB
  * corpus of the same record shape the bench/ratchet corpora use, min of 3
  * timed reps after a warm pass. Emits ONE JSON line:
  *
  *   {"metric":"decode_rate_single_task","unit":"MB/s",
  *    "formats":{"fcs":{"mb":…,"sec":…,"mbps":…},…}}
  *
  * Redirect to DECODE_RATE_r{N}.json per round; compare mbps per format
  * round-over-round (corpora are content-deterministic and cached under
  * GRAFT_DECODERATE_DIR with _done markers, so bytes are identical too).
  *
  * Scan PROJECTIONS mirror the corresponding bench arms (b02/b18/b14/
  * b16/b17, FormatSplitScale): full payload decode for the sequence
  * formats, the projection-the-arm-uses for FCS/SDF (the reader is
  * projection-aware; that IS the measured capability). The FORCING
  * differs from the bench arms on purpose — see the octet_length note at
  * the rate() calls.
  */
object DecodeRate {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      sys.env.getOrElse("GRAFT_DECODERATE_DIR", "/tmp/graft_decoderate"))
    dir.mkdirs()
    val s = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("WARN")

    // ---- corpora (generated once, _done-guarded) ----
    val gb = new java.io.File(dir, "decoderate.gb")
    Corpora.writeGenBank(gb, 600000) // ~156 MB
    val sdf = new java.io.File(dir, "decoderate.sdf")
    Corpora.writeSdf(sdf, 1000000) // ~177 MB
    val fcs = new java.io.File(dir, "decoderate.fcs")
    Corpora.writeFcs(fcs, 6000000) // ~192 MB
    val mz = new java.io.File(dir, "decoderate.mzML")
    Corpora.writeMzml(mz, 120000) // ~137 MB
    val mzWide = new java.io.File(dir, "decoderate_wide.mzML")
    Corpora.writeMzmlWide(mzWide, 600, 30000) // ~180 MB, 240 KB zlib blobs

    def sparkGen(name: String)(write: String => Unit): java.io.File = {
      val sub = new java.io.File(dir, name)
      val done = new java.io.File(dir, name + "._done")
      if (!done.exists()) { write(sub.getAbsolutePath); done.createNewFile() }
      sub
    }
    // FASTA: the b02 shape (md5-derived sequences), one shard.
    val fasta = sparkGen("fasta") { p =>
      s.range(0, 700000L).select(
          concat(lit("seq"), col("id")).as("id"),
          lit(null).cast("string").as("description"),
          translate(concat(md5(col("id").cast("string")),
              md5((col("id") + 1000000L).cast("string")),
              md5((col("id") + 2000000L).cast("string")),
              md5((col("id") + 3000000L).cast("string")),
              md5((col("id") + 4000000L).cast("string")),
              md5((col("id") + 5000000L).cast("string"))),
            "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"))
        .repartition(1)
        .write.format("fasta").mode("overwrite").save(p)
    }
    // FASTA plain-gzip (r17): the whole-file UNSPLITTABLE landing shape —
    // one sequential gzip member (NOT BGZF), so block-parallel inflate is
    // impossible and the only available overlap is the single-producer
    // decode/parse pipe (AsyncChunkedInputStream). Transcoded from the
    // fasta corpus so both rows decode identical records.
    val fastaGz = sparkGen("fasta_gz") { p =>
      new java.io.File(p).mkdirs()
      val src = fasta.listFiles().filter(_.getName.endsWith(".fasta")).head
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(
          new java.io.File(p, "decoderate.fasta.gz")), 1 << 16)
      val in = new java.io.FileInputStream(src)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close(); out.close()
    }
    // VCF (r17): the b15 landing shape — ONE bgzipped VCF, no index. The
    // r17 whole-file BGZF fix removed sequential inflate from this gate;
    // what remains is the typed per-field text parse itself.
    val vcfDir = new java.io.File(dir, "vcfgz")
    Corpora.writeUnindexedVcfGz(s, vcfDir.getAbsolutePath, 2400000L)
    val vcf = new java.io.File(vcfDir, "calls.vcf.gz")
    // GFF (r17 opt round): plain-text feature lines, ONE shard — measures
    // the LineFormat byte-span parse (tab split + typed fields) the same
    // way vcf_bgzf measures VCF's, minus the BGZF layer. Attributes are
    // written but NOT projected (column pruning drops them — the
    // coordinate-query shape f05/f13 grade).
    val gff = sparkGen("gff") { p =>
      s.range(0, 2000000L).select(
          concat(lit("chr"), (col("id") % 8).cast("string")).as("seqname"),
          lit("graft").as("source"),
          lit("exon").as("type"),
          ((col("id") / 8).cast("long") * 40 + 1).as("start"),
          ((col("id") / 8).cast("long") * 40 + 30).as("end"),
          (col("id") % 60).cast("float").as("score"),
          lit("+").as("strand"),
          lit(null).cast("string").as("phase"),
          map(lit("ID"), array(concat(lit("f"), col("id").cast("string"))),
            lit("H"), array(md5(col("id").cast("string")))).as("attributes"))
        .repartitionByRange(1, col("seqname"), col("start"))
        .sortWithinPartitions("seqname", "start")
        .write.format("gff").mode("overwrite").save(p)
    }
    // FASTQ: the b18 landing shape — ONE bgzipped shard, no index.
    val fastqDir = new java.io.File(dir, "fastqgz")
    Corpora.writeUnindexedFastqBgzf(s, fastqDir.getAbsolutePath, 1200000L)
    val fastq = new java.io.File(fastqDir, "t")
    // BAM: the b14 shape — ONE coordinate-sorted shard, high-entropy reads.
    val refs = (0 until 8).map(i => s"chr$i:30000000").mkString(",")
    val bam = sparkGen("bam") { p =>
      s.range(0, 1500000L).select(
          concat(lit("r"), col("id")).as("name"),
          lit(0).as("flag"),
          concat(lit("chr"), (col("id") % 8).cast("string")).as("reference"),
          ((col("id") / 8).cast("long") * 100 + 1).as("start"),
          ((col("id") / 8).cast("long") * 100 + 100).as("end"),
          lit("30").as("mapping_quality"),
          lit("100M").as("cigar"),
          lit(null).cast("string").as("mate_reference"),
          translate(
            substring(concat(md5(col("id").cast("string")),
              md5((col("id") + 7000000L).cast("string")),
              md5((col("id") + 14000000L).cast("string")),
              md5((col("id") + 21000000L).cast("string"))), 1, 100),
            "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
          array_repeat(lit(30L), 100).as("quality_score"),
          array().cast("array<struct<tag:string,value:string>>").as("tags"))
        .repartitionByRange(1, col("reference"), col("start"))
        .sortWithinPartitions("reference", "start")
        .write.format("bam").mode("overwrite").option("refs", refs).save(p)
    }
    // CRAM: the b17 shape — the BAM corpus transcoded, .crai dropped.
    val cram = sparkGen("cram") { p =>
      s.read.format("bam").load(bam.getAbsolutePath)
        .repartitionByRange(1, col("reference"), col("start"))
        .sortWithinPartitions("reference", "start")
        .write.format("cram").mode("overwrite").option("refs", refs).save(p)
      new java.io.File(p).listFiles().foreach { f =>
        if (f.getName.endsWith(".crai")) require(f.delete())
      }
    }
    // Image codec stage (l10/l13/l67/l71 shape): 100k deterministic PNGs
    // of the l10 size mix in ONE parquet shard of binary payloads — the
    // decode measured is javax.imageio (zlib inflate + filter
    // reconstruction), the first-class decode path an imageio regression
    // (JDK update, cache-setting drift) would silently slow.
    val image = sparkGen("image") { p =>
      import s.implicits._
      s.range(0, 100000L).repartition(1).as[Long].mapPartitions { it =>
        it.map { id =>
          val w = 24 + (id % 5).toInt * 8
          val h = 24 + ((id * 3) % 7).toInt * 4
          (id, graft.functions.ImageOps.synthPng(w, h, id))
        }
      }.toDF("id", "image").write.mode("overwrite").parquet(p)
    }
    // Audio codec stage (l69/l70 shape): 50k deterministic stereo WAV
    // clips, same single-shard discipline.
    val audio = sparkGen("audio") { p =>
      import s.implicits._
      s.range(0, 50000L).repartition(1).as[Long].mapPartitions { it =>
        it.map { id =>
          val frames = 400 + (id % 7).toInt * 100
          (id, graft.functions.AudioOps.synthWav(frames, id))
        }
      }.toDF("id", "audio").write.mode("overwrite").parquet(p)
    }
    // Video codec stage (l72 shape): 20k multi-frame GIF clips.
    val video = sparkGen("video") { p =>
      import s.implicits._
      s.range(0, 20000L).repartition(1).as[Long].mapPartitions { it =>
        it.map { id =>
          (id, graft.functions.ImageOps.synthGif(id, 4 + (id % 5).toInt))
        }
      }.toDF("id", "video").write.mode("overwrite").parquet(p)
    }

    def dataBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else f.listFiles().filter(x => x.isFile && !x.getName.startsWith("_") &&
        !x.getName.startsWith(".")).map(_.length).sum

    // ---- measurement: ONE task per scan (whole-file plan) ----
    s.conf.set("spark.sql.files.maxPartitionBytes", "17179869184")
    s.conf.set("spark.sql.files.openCostInBytes", "17179869184")

    var rows = Vector.empty[(String, Long, Double)]
    // GRAFT_DECODERATE_ONLY=bam restricts to one family (profiling aid);
    // GRAFT_DECODERATE_REPS raises the rep count for longer JFR windows
    val only = sys.env.get("GRAFT_DECODERATE_ONLY")
    val reps = sys.env.getOrElse("GRAFT_DECODERATE_REPS", "3").toInt
    def rate(name: String, corpus: java.io.File)(scan: => DataFrame): Unit = {
      if (!only.forall(_ == name)) return
      def run(): Unit = { val r = scan.collect(); require(r.nonEmpty) }
      try {
        run() // warm (page cache + codegen)
        val sec = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }.min
        rows :+= ((name, dataBytes(corpus), sec))
      } catch { case e: Throwable =>
        System.err.println(s"[decoderate] FAILED $name: ${e.getMessage}")
        rows :+= ((name, dataBytes(corpus), -1.0))
      }
    }

    // Forcing uses octet_length (O(1) on UTF8String), NOT length():
    // length() counts CHARS by walking the bytes, and on ~100-byte string
    // columns that walk was 58% of the measured "bam decode" profile —
    // the gate must time the READER, not the aggregate expression. (The
    // Bench b-arms keep length() for cross-round comparability; their
    // numbers measure the end-to-end query, this gate measures decode.)
    rate("fasta", fasta)(s.read.format("fasta").load(fasta.getAbsolutePath)
      .agg(count(lit(1)), sum(octet_length(col("sequence")))))
    rate("fasta_gz", fastaGz)(s.read.format("fasta").load(fastaGz.getAbsolutePath)
      .agg(count(lit(1)), sum(octet_length(col("sequence")))))
    rate("vcf_bgzf", vcf)(s.read.format("vcf").load(vcf.getAbsolutePath)
      .agg(sum(col("pos")), sum(octet_length(col("info"))),
        sum(octet_length(col("ref"))), sum(col("qual"))))
    rate("gff", gff)(s.read.format("gff").load(gff.getAbsolutePath)
      .agg(count(lit(1)), sum(col("start")), sum(col("end")),
        sum(col("score")), sum(octet_length(col("type")))))
    rate("fastq_bgzf", fastq)(s.read.format("fastq").load(fastq.getAbsolutePath)
      .agg(count(lit(1)), sum(octet_length(col("sequence"))),
        sum(octet_length(col("quality_scores")))))
    rate("bam", bam)(s.read.format("bam").load(bam.getAbsolutePath)
      .agg(sum(col("flag")), sum(octet_length(col("sequence")))))
    rate("cram", cram)(s.read.format("cram").load(cram.getAbsolutePath)
      .agg(sum(col("flag")), sum(octet_length(col("sequence")))))
    rate("genbank", gb)(s.read.format("genbank").load(gb.getAbsolutePath)
      .agg(count(lit(1)), sum(octet_length(col("sequence")))))
    rate("sdf", sdf)(s.read.format("sdf").load(sdf.getAbsolutePath)
      .agg(count(lit(1)), sum(col("atom_count")),
        sum(col("data")("id").cast("long"))))
    rate("fcs", fcs)(s.read.format("fcs").load(fcs.getAbsolutePath)
      .agg(count(lit(1)), sum(col("FSC-A").cast("double"))))
    rate("mzml", mz)(s.read.format("mzml").load(mz.getAbsolutePath)
      .agg(count(lit(1)),
        sum(expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)"))))
    // Wide-spectrum shape: blobs over the async threshold inflate on the
    // shared pool when cores are idle — at w1 (this gate) that IS the
    // capability being measured: one scan task + idle-core inflate.
    rate("mzml_wide", mzWide)(s.read.format("mzml").load(mzWide.getAbsolutePath)
      .agg(count(lit(1)),
        sum(expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)"))))
    // Pruned projection: id only — proves column pruning reaches the codec
    // (zero base64+inflate for mz/intensity/wavelength). Expected
    // genbank-class throughput: the residual is StAX traversal.
    rate("mzml_pruned", mz)(s.read.format("mzml").load(mz.getAbsolutePath)
      .agg(count(lit(1)), sum(octet_length(col("id")))))
    // Codec stages: the decode runs inside the scan task's mapPartitions
    // (same shape as the l-queries); the sum over decoded pixels/samples
    // forces every byte through the codec.
    rate("image", image) {
      import s.implicits._
      s.read.parquet(image.getAbsolutePath).select("image").as[Array[Byte]]
        .mapPartitions { it =>
          var n = 0L; var px = 0L
          it.foreach { b =>
            val img = graft.functions.ImageOps.decode(b)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { px += img.getRGB(x, y) & 0xff; x += 1 }
              y += 1
            }
            n += 1
          }
          Iterator((n, px))
        }.toDF("n", "px").agg(sum("n"), sum("px"))
    }
    rate("audio", audio) {
      import s.implicits._
      s.read.parquet(audio.getAbsolutePath).select("audio").as[Array[Byte]]
        .mapPartitions { it =>
          var n = 0L; var sm = 0L
          it.foreach { b =>
            val clip = graft.functions.AudioOps.decode(b)
            var i = 0
            while (i < clip.samples.length) { sm += clip.samples(i); i += 1 }
            n += 1
          }
          Iterator((n, sm))
        }.toDF("n", "sm").agg(sum("n"), sum("sm"))
    }
    rate("video", video) {
      import s.implicits._
      s.read.parquet(video.getAbsolutePath).select("video").as[Array[Byte]]
        .mapPartitions { it =>
          var n = 0L; var px = 0L
          it.foreach { b =>
            graft.functions.ImageOps.decodeGif(b).foreach { img =>
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { px += img.getRGB(x, y) & 0xff; x += 1 }
                y += 1
              }
            }
            n += 1
          }
          Iterator((n, px))
        }.toDF("n", "px").agg(sum("n"), sum("px"))
    }

    val fields = rows.map { case (name, bytes, sec) =>
      val mb = bytes / 1e6
      val mbps = if (sec > 0) mb / sec else -1.0
      f""""$name":{"mb":$mb%.1f,"sec":$sec%.3f,"mbps":$mbps%.1f}"""
    }
    println(s"""{"metric":"decode_rate_single_task","unit":"MB/s",""" +
      s""""formats":{${fields.mkString(",")}}}""")
    s.stop()
  }
}
