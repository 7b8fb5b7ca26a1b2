package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused scan microbench for iterating on the text-format hot path
  * (byte-level parse, columnar batches) without the full Bench harness:
  * times N reps of the b01/b02 shapes on an existing FASTA corpus dir.
  *
  * Usage: ScanBench <fastaDir> [reps] [threads]
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val threads = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$name%-24s ${ts.map(_._1).min}%8.3f s (min of $reps, rows=${ts.head._2})")
    }
    // collect() the aggregate row — .count() over an agg lets Catalyst's
    // RemoveRedundantAggregates drop the unreferenced sum, timing
    // inflate+skip instead of full decode (the r11 Bench honesty fix)
    time("b02_full_sum_len") {
      spark.read.format("fasta").load(dir)
        .agg(sum(length(col("sequence")))).collect().length.toLong
    }
    time("b01_predicate") {
      spark.read.format("fasta").load(dir)
        .filter(col("sequence").startsWith("A")).count()
    }
    time("id_only_projection") {
      spark.read.format("fasta").load(dir)
        .agg(count(col("id"))).collect().length.toLong
    }
    spark.read.format("fasta").load(dir)
      .agg(sum(length(col("sequence"))))
      .explain("formatted")
    spark.stop()
  }
}
