package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe for the r18 mzML small-blob GROUP batching: interleaves the
  * batched and unbatched (r17 inline) decode paths in ONE JVM via the
  * `graft.mzml.batch` system property (captured per reader), over the
  * DecodeRate mzML corpus. Full decode = mz + intensity sums, so every
  * blob pays base64+inflate+doubles.
  *
  * Env: SPARK_GRAFT_CPUS (default 8, the DecodeRate gate width),
  * SPARK_GRAFT_REPS (default 4).
  */
object MzProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      sys.env.getOrElse("GRAFT_DECODERATE_DIR", "/tmp/graft_decoderate"))
    dir.mkdirs()
    val s = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val mz = new java.io.File(dir, "decoderate.mzML")
    Corpora.writeMzml(mz, 120000)
    val bytes = mz.length()

    def scan(): Unit =
      s.read.format("mzml").load(mz.getAbsolutePath)
        .agg(count(lit(1)),
          sum(expr("aggregate(mz.mz, 0D, (a, x) -> a + x)")),
          sum(expr("aggregate(intensity.intensity, 0D, (a, x) -> a + x)")))
        .write.mode("overwrite").format("noop").save()

    def timed(): Double = {
      val t0 = System.nanoTime(); scan(); (System.nanoTime() - t0) / 1e9
    }

    // warm both paths
    sys.props("graft.mzml.batch") = "0"; scan()
    sys.props("graft.mzml.batch") = "1"; scan()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    (1 to reps).foreach { _ =>
      sys.props("graft.mzml.batch") = "0"
      rows += "unbatched" -> timed()
      sys.props("graft.mzml.batch") = "1"
      rows += "batched" -> timed()
    }
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val best = vs.map(_._2).min
      println(f"PROBE mzml $k min=$best%.3f mbps=${bytes / best / 1e6}%.1f " +
        f"reps=${vs.map(v => f"${v._2}%.3f").mkString(",")}")
    }
    s.stop()
  }
}
