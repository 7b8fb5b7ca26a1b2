package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to stdout —
  * the round's before/after plan evidence (plans/r<N>/<query>_{before,after}
  * .txt). Unlike PlanDump (curated PLANS.md), this takes any query name.
  *
  * Usage: runMain graft.tools.PlanOf <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object PlanOf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.LocalSession.buildBench(cpus)
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      println(s"===== PLAN $name =====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
