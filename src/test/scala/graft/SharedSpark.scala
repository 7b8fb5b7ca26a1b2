package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across all suites (JVM startup dominates test
  * time otherwise). Forked test JVM gets the add-opens flags from build.sbt.
  */
object SharedSpark {
  lazy val session: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
}

trait SharedSpark {
  lazy val spark: SparkSession = SharedSpark.session
}
