package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap: registers every Graft SQL function on a session.
  *
  * Mirrors the reference's `ExonSession` registration surface
  * (/root/reference/exon/exon-core/src/session_context/exon_context_ext.rs:190-258)
  * but via Spark's FunctionRegistry. Idempotent — safe to call per query.
  */
object GraftSession {

  // Keyed on the session object itself; weak so dropped sessions don't pin.
  private val registered = new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def registerAll(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.containsKey(spark)) {
      graft.functions.GraftFunctions.registerAll(spark)
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }

  /** Convenience builder for local use (tests / benchmarks). */
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerAll(spark)
    spark
  }
}
