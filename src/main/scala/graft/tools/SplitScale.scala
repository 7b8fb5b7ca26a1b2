package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale ratchet for the index-free BGZF split: one UNINDEXED bgzipped
  * VCF 10x the b15 corpus (20M rows, ~0.5 GB compressed), full-decoded at
  * width 1 vs 32 — the per-byte-dominated regime where fixed costs can't
  * flatter the curve. Run:
  *
  *   sbt "runMain graft.tools.SplitScale"
  */
object SplitScale {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      sys.env.getOrElse("GRAFT_SPLITSCALE_DIR", "/tmp/graft_sf1_vcfgz"))
    dir.mkdirs()
    if (!new java.io.File(dir, "_done").exists()) {
      val s = graft.LocalSession.buildBench("32")
      val sink = new java.io.File(dir, "sink").getAbsolutePath
      s.range(0, 20000000L).select(
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
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val gz = new java.io.File(dir, "calls.vcf.gz")
    println(f"corpus: ${gz.length() / 1e6}%.1f MB compressed, 20M rows, no index")
    Seq("1", "32").foreach { w =>
      val s = graft.LocalSession.buildBench(w)
      def scan(): Long = s.read.format("vcf").load(gz.getAbsolutePath)
        .agg(sum(col("pos")), sum(length(col("info")))).count()
      scan() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); scan(); (System.nanoTime() - t0) / 1e9
      }
      val parts = s.read.format("vcf").load(gz.getAbsolutePath).rdd.getNumPartitions
      println(f"SPLITSCALE w$w%s parts=$parts min=${times.min}%.2f " +
        s"reps=${times.map(t => f"$t%.2f").mkString(",")}")
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
