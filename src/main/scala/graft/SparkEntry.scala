package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{FormatQueries, LlmQueries, RelationalQueries, StreamQueries, UdfQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area packs; each oracle-backed entry has
  * a DuckDB-runnable SQL twin in `oracleSql` with identical column names and
  * ORDER BY so the driver's hash compare is deterministic.
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (UdfQueries.queries, UdfQueries.oracles),
      (FormatQueries.queries, FormatQueries.oracles),
      (LlmQueries.queries, LlmQueries.oracles),
      (StreamQueries.queries, StreamQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.registerAll(spark)
    RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = packs.map(_._1).reduce(_ ++ _)
    m.map { case (k, f) =>
      k -> { (s: SparkSession, d: String) =>
        // Pin UTC so date/hour bucketing matches the (timezone-naive) DuckDB
        // oracle regardless of the driver session's zone.
        s.conf.set("spark.sql.session.timeZone", "UTC")
        GraftSession.registerAll(s)
        f(s, d)
      }
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.map(_._2).reduce(_ ++ _)
}
