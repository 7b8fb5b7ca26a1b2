package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe for the r18 CC-propagation round shapes: times the r17
  * full-join round loop against the r18 delta-frontier loop (broadcast and
  * forced-shuffle arms) over the SAME checkpointed pair set, interleaved in
  * ONE JVM — the only protocol that survives this host's phase drift.
  * (Earlier life as a localCheckpoint-partitioning probe: that answer was
  * NO — an Exchange follows a k-partitioned cut, so co-partitioned rounds
  * are off the table.)
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = graft.LocalSession.buildBench(cpus)
    graft.GraftSession.registerAll(spark)

    val pairs = graft.queries.LlmQueries.jaccardPairs(spark, sfDir)
      .select(col("ida"), col("idb")).localCheckpoint()

    // r17 shape, reconstructed verbatim
    def ccOld(): Long = {
      val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
        .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
        .localCheckpoint()
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")).localCheckpoint()
      var converged = false
      var iter = 0
      var prevSum: Option[java.math.BigDecimal] = None
      while (!converged && iter < 25) {
        val prop = edges.join(labels, edges("dst") === labels("doc_id"))
          .select(edges("src").as("doc_id"), col("label"))
        val obs = org.apache.spark.sql.Observation()
        val next = labels.unionAll(prop)
          .groupBy("doc_id").agg(min(col("label")).as("label"))
          .observe(obs, sum(col("label").cast("decimal(38,0)")).as("s"))
          .localCheckpoint()
        val s = obs.get("s").asInstanceOf[java.math.BigDecimal]
        converged = s == null || prevSum.exists(p => p != null && p.compareTo(s) == 0)
        prevSum = Some(s)
        labels = next
        iter += 1
      }
      labels.count()
    }

    def ccNew(): Long =
      graft.queries.LlmQueries
        .connectedComponents(pairs).count()

    def time(name: String)(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    // warm both
    ccOld(); ccNew()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    (1 to reps).foreach { _ =>
      rows += "old" -> time("old")(ccOld)
      rows += "new_bcast" -> time("new_bcast")(ccNew)
      spark.conf.set("spark.graft.cc.broadcastFrontierRows", "0")
      rows += "new_shuffle" -> time("new_shuffle")(ccNew)
      spark.conf.unset("spark.graft.cc.broadcastFrontierRows")
    }
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, vs) =>
      println(f"PROBE ccprop $k min=${vs.map(_._2).min}%.3f reps=${vs.map(v => f"${v._2}%.3f").mkString(",")}")
    }

    // Frontier-size curve (the evidence the delta-frontier decision rests
    // on): per round, how many labels actually changed vs the full table.
    {
      val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
        .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
        .localCheckpoint()
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")).localCheckpoint()
      val total = labels.count()
      var iter = 0
      var changed = -1L
      while (changed != 0L && iter < 25) {
        val prop = edges.join(labels.select(col("doc_id").as("dst"),
            col("label").as("nl")), "dst")
          .select(col("src").as("doc_id"), col("nl").as("label"),
            lit(false).as("old"))
        val obs = org.apache.spark.sql.Observation()
        val next = labels
          .select(col("doc_id"), col("label"), lit(true).as("old"))
          .unionAll(prop)
          .groupBy("doc_id").agg(min(col("label")).as("label"),
            min(when(col("old"), col("label"))).as("lold"))
          .select(col("doc_id"), col("label"),
            (col("label") < col("lold")).as("chg"))
          .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("nchg"))
          .localCheckpoint()
        val n = obs.get("nchg")
        changed = if (n == null) 0L else n.asInstanceOf[Long]
        labels = next.select("doc_id", "label")
        iter += 1
        println(s"PROBE frontier round=$iter changed=$changed of=$total")
      }
    }
    spark.stop()
  }
}

/** Job-level decomposition of one query: prints every Spark job's duration
  * and description so loop-shaped queries (BPE, CC) show where their round
  * overhead sits.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.LocalSession.buildBench(cpus)
    graft.GraftSession.registerAll(spark)
    val name = args(0)
    val fn = graft.SparkEntry.queries(name)
    // warm
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, String.valueOf(js.properties.getProperty("spark.job.description"))))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(je.jobId, je.time)
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val rows = jobs.asScala.toSeq.sortBy(_._1).map { case (id, (st, desc)) =>
      (id, done.getOrDefault(id, st) - st, desc.take(60))
    }
    rows.foreach { case (id, ms, desc) => println(f"JOB $id%3d ${ms}%5d ms  $desc") }
    println(f"JOBPROBE $name total=${total}%.3f njobs=${rows.size} jobms=${rows.map(_._2).sum}")
    spark.stop()
  }
}
