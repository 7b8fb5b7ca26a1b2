package graft

import org.apache.spark.sql.SparkSession

/** The one local-session shape shared by Bench, QTime and PlanDump, so
  * their numbers and plans stay comparable by construction.
  *
  * AQE coalesces small shuffle reads by SIZE (parallelismFirst=false):
  * with the default, every tiny exchange still fans out to ~#cores tasks
  * and multi-stage queries pay pure scheduler overhead. The 4m advisory
  * (not the 64m default) is sized for the sf0.1 bench corpus, where the
  * q-pack's CPU-bound joins need their parallelism back (32m collapsed
  * q07's ~100 MB shuffles to a handful of tasks: 1.2s -> 3.0s). On a real
  * cluster raise it back to executor-sized (64-128m), where scans dominate
  * and per-task overhead amortizes — override via SPARK_GRAFT_ADVISORY.
  */
object LocalSession {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "4m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
