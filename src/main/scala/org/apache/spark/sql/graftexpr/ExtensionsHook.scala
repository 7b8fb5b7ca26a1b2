package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Test-visible bridge to the private[sql] check-rule builder list: lets a
  * spec run exactly what Spark runs at analyzer construction for a session
  * created with `spark.sql.extensions=graft.GraftExtensions` — a static
  * conf that cannot be applied to an already-running test SparkContext.
  */
object ExtensionsHook {
  def runCheckRuleBuilders(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.buildCheckRules(spark)
}
