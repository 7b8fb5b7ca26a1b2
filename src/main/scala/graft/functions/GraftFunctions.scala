package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration hub for all Graft SQL functions (populated per-module). */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    // per-module registrations are appended as modules land
  }
}
