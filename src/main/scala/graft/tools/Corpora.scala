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
}
