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
}
