package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Delta Lake passthrough (reference: register_delta_table,
  * exon_context_ext.rs:184-188). Spark-side this is pure passthrough —
  * `spark.read.format("delta")` — so there is nothing for graft to build;
  * this smoke test pins that the format resolves and round-trips WHEN the
  * delta-spark jars are on the classpath, and self-cancels (not fails)
  * where they are absent, making the env-dependence explicit rather than
  * silent. See README "Delta passthrough".
  */
class DeltaPassthroughSpec extends AnyFunSuite with SharedSpark {

  private def deltaPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource"); true }
    catch { case _: ClassNotFoundException => false }

  test("delta round-trip (cancels without delta-spark jars)") {
    assume(deltaPresent, "delta-spark not on classpath")
    import spark.implicits._
    val dir = graft.TestTmp.dir("graft_delta").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("delta").mode("overwrite").save(dir)
    assert(spark.read.format("delta").load(dir).count() == 2)
  }
}
