package graft.sources

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics surfaced on the scan node of the Spark SQL UI — the
  * per-query observability a 100 TB deployment steers by: how many files
  * survived pruning, how many chunks the indexes left, and how many records
  * each task actually parsed (vs the post-filter output rows Spark already
  * shows — the difference is residual-filter selectivity).
  *
  * Each metric class needs a public 0-arg constructor: the SQL status
  * listener re-instantiates them by reflection to aggregate task values.
  */
final class FilesListedMetric extends CustomSumMetric {
  override def name(): String = "filesListed"
  override def description(): String = "files scanned (after partition/index file pruning)"
}

final class ChunksPlannedMetric extends CustomSumMetric {
  override def name(): String = "chunksPlanned"
  override def description(): String = "chunks planned (after index chunk pruning and splits)"
}

final class PlannedBytesMetric extends CustomSumMetric {
  override def name(): String = "plannedBytes"
  override def description(): String = "bytes planned for scan (compressed where applicable)"
}

final class ChunksReadMetric extends CustomSumMetric {
  override def name(): String = "chunksRead"
  override def description(): String = "chunks read by tasks"
}

final class RecordsParsedMetric extends CustomSumMetric {
  override def name(): String = "recordsParsed"
  override def description(): String = "records parsed (before residual filters)"
}

final case class GraftTaskMetric(metricName: String, v: Long) extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}
