package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planning-cost probe for the unindexed-CRAM index-free split, sweep vs
  * task-open resync, over an object store (MiniS3 on loopback — real HTTP,
  * real SigV4-shaped GETs, zero network noise).
  *
  * The round-12 sweep is I/O-bounded per GET but still O(containers) driver
  * round-trips once containers outgrow the 64 KB read-ahead window — every
  * real ~1-5 MB-container CRAM. The round-13 task-open resync plans in O(1)
  * driver GETs (one 6-byte magic sniff) and moves the alignment work into
  * the tasks, which were going to read those bytes anyway. This tool prints
  * both planning times and GET counts on the same corpus, plus full-scan
  * wall times, so BENCH_NOTES can carry measured numbers instead of
  * asymptotics. Run:
  *   sbt "runMain graft.tools.CramPlanScale"
  */
object CramPlanScale {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(
      sys.env.getOrElse("GRAFT_CRAMPLAN_DIR", "/tmp/graft_cramplan"))
    dir.mkdirs()
    val s = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val cramDir = new java.io.File(dir, "t")
    if (!new java.io.File(dir, "_done").exists()) {
      val n = 2000000L
      // 10k records/container (the sink default) -> ~200 containers of
      // ~1 MB: the real-CRAM shape where every header probe outgrows the
      // sweep window and forces one GET per container.
      s.range(0, n).select(
          concat(lit("r"), col("id")).as("name"),
          lit(0).as("flag"),
          concat(lit("chr"), (col("id") % 2 + 1).cast("string")).as("reference"),
          ((col("id") / 2).cast("long") * 100 + 1).as("start"),
          ((col("id") / 2).cast("long") * 100 + 100).as("end"),
          lit("30").as("mapping_quality"),
          lit("100M").as("cigar"),
          lit(null).cast("string").as("mate_reference"),
          translate(substring(concat(md5(col("id").cast("string")),
              md5((col("id") + n).cast("string")),
              md5((col("id") + 2 * n).cast("string")),
              md5((col("id") + 3 * n).cast("string"))), 1, 100),
            "0123456789abcdef", "ACGTACGTACGTACGT").as("sequence"),
          array_repeat(lit(30L), 100).as("quality_score"),
          array().cast("array<struct<tag:string,value:string>>").as("tags"))
        .repartitionByRange(1, col("reference"), col("start"))
        .sortWithinPartitions("reference", "start")
        .write.format("cram").mode("overwrite")
        .option("refs", "chr1:110000000,chr2:110000000")
        .save(cramDir.getAbsolutePath)
      cramDir.listFiles().foreach { f =>
        if (f.getName.endsWith(".crai")) require(f.delete())
      }
      new java.io.File(dir, "_done").createNewFile()
    }
    val cram = cramDir.listFiles().filter(_.getName.endsWith(".cram"))
      .minBy(_.getName)
    println(f"corpus: ${cram.length() / 1e6}%.1f MB unindexed CRAM, 2M records, ~10k/container")

    val bytes = java.nio.file.Files.readAllBytes(cram.toPath)
    val s3 = new MiniS3().start()
    val hc = s.sparkContext.hadoopConfiguration
    hc.set("fs.s3.impl", classOf[graft.sources.s3.S3HttpFileSystem].getName)
    hc.set("fs.s3.endpoint", s3.endpoint)
    hc.set("fs.s3.impl.disable.cache", "true")
    s.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    s.conf.set("spark.sql.files.openCostInBytes", (1L << 20).toString)
    try {
      // separate keys per mode: the planner memoizes cuts/sniffs per path
      s3.put("graft-plan", "resync/u.cram", bytes)
      s3.put("graft-plan", "sweep/u.cram", bytes)
      import scala.jdk.CollectionConverters._
      def gets(key: String): Int =
        s3.requests.asScala.count(r => r._1 == "GET" && r._2.contains(key))
      def plan(mode: String, key: String): Unit = {
        hc.set("graft.cram.resyncSplit.enabled",
          if (mode == "sweep") "false" else "true")
        val g0 = gets(key)
        val t0 = System.nanoTime()
        val parts = s.read.format("cram").load(s"s3://graft-plan/$key/u.cram")
          .rdd.getNumPartitions
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PLAN $mode%-6s parts=$parts%-3d getsOnObject=${gets(key) - g0}%-6d wall=$dt%.3f s")
      }
      plan("resync", "resync")
      plan("sweep", "sweep")

      // end-to-end scan parity over LOCAL disk (the task-open resync must
      // not cost the scan what it saved the planner)
      def scan(mode: String): Unit = {
        hc.set("graft.cram.resyncSplit.enabled",
          if (mode == "sweep") "false" else "true")
        def rep(): (Long, Double) = {
          val t0 = System.nanoTime()
          val r = s.read.format("cram").load(cram.getAbsolutePath)
            .agg(count(lit(1)), sum(col("start"))).collect()
          (r(0).getLong(0), (System.nanoTime() - t0) / 1e9)
        }
        rep() // warm
        val reps = (1 to 3).map(_ => rep())
        println(f"SCAN $mode%-6s rows=${reps.head._1} " +
          f"min=${reps.map(_._2).min}%.2f s reps=${reps.map(r => f"${r._2}%.2f").mkString(",")}")
      }
      scan("resync")
      scan("sweep")
    } finally {
      s3.stop()
      hc.unset("graft.cram.resyncSplit.enabled")
      s.stop()
    }
  }
}
