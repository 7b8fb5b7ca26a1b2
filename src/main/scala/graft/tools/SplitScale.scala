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
      // the b15 corpus shape at 10x rows — one shared definition (Corpora)
      Corpora.writeUnindexedVcfGz(s, dir.getAbsolutePath, 20000000L)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    val gz = new java.io.File(dir, "calls.vcf.gz")
    println(f"corpus: ${gz.length() / 1e6}%.1f MB compressed, 20M rows, no index")
    Seq("1", "32").foreach { w =>
      val s = graft.LocalSession.buildBench(w)
      // collect() the aggregate row — .count() over an agg lets Catalyst
      // drop the unreferenced sums (r11 Bench honesty fix; this tool had
      // the same bug, so its recorded r11 numbers timed inflate+skip)
      def scan(): Long = s.read.format("vcf").load(gz.getAbsolutePath)
        .agg(sum(col("pos")), sum(length(col("info")))).collect().length.toLong
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
