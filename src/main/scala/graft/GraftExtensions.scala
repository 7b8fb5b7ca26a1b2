package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-wide entry point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * registers every Graft scalar function and SQL table function on each new
  * session with no driver-side code — the deployment shape for a shared
  * cluster, mirroring how the reference installs itself on a session
  * (exon_context_ext.rs:190-258).
  *
  * Registration rides the check-rule injection point: the rule builder is
  * invoked once per session WITH the session, which is exactly the hook
  * needed for FunctionRegistry/TableFunctionRegistry population;
  * GraftSession.registerAll is idempotent, and the returned check rule
  * itself does nothing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule { spark =>
      GraftSession.registerAll(spark)
      _ => ()
    }
  }
}
