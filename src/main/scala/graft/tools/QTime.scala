package graft.tools


/** Dev helper: time individual SparkEntry queries by name.
  *
  *   sbt "runMain graft.tools.QTime l03_ngram_jaccard_pairs l14_dup_clusters"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_REPS (default 3). Prints per-rep and min seconds. Same
  * session conf as Bench so numbers are comparable.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Default forcing is a noop-sink write (matches Bench PHASE 3):
    // count() over a final aggregate lets Catalyst prune the unreferenced
    // aggregate VALUES (only group keys determine row count), so it times
    // scan+join+groupBy but not the aggregate arithmetic. noop
    // materializes every output column. SPARK_GRAFT_FORCE=count restores
    // the pre-r12 convention for comparisons against old boards.
    val force = sys.env.getOrElse("SPARK_GRAFT_FORCE", "noop")
    require(force == "noop" || force == "count",
      s"SPARK_GRAFT_FORCE must be 'noop' or 'count', got '$force' — a typo " +
        "would silently fall back to the Catalyst-pruned count() measurement")
    val spark = graft.LocalSession.buildBench(cpus)
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      def run(): Unit =
        if (force == "noop")
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        else fn(spark, sfDir).count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $name min=${times.min}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
