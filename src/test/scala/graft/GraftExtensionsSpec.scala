package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftexpr.ExtensionsHook
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` deployment path. The static
  * conf only takes effect at SparkContext creation, which a shared test JVM
  * can't redo — so this spec runs the exact injection Spark performs when
  * it builds the analyzer for such a session: collect the injected
  * check-rule builders and invoke them with the session.
  */
class GraftExtensionsSpec extends AnyFunSuite with SharedSpark {

  test("extensions class registers functions and UDTFs on an isolated session") {
    val ns = spark.newSession() // isolated FunctionRegistry/TableFunctionRegistry
    // not registered yet on the fresh session
    assertThrows[org.apache.spark.sql.AnalysisException] {
      ns.sql("SELECT reverse_complement('ATCG')").collect()
    }
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ExtensionsHook.runCheckRuleBuilders(ext, ns)
    assert(ns.sql("SELECT reverse_complement('ATCG') AS rc").head().getString(0) == "CGAT")
    assert(ns.sql("SELECT is_unmapped(4) AS u").head().getBoolean(0))
    val fx = "/root/reference/exon/exon-core/test-data/datasources"
    assert(ns.sql(s"SELECT count(*) FROM fasta_scan('$fx/fasta/test.fasta')")
      .head().getLong(0) == 2)
  }
}
