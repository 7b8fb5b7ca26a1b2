package graft.sources

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Micro-batch streaming over a graft table's file listing: every format
  * (`spark.readStream.format("fasta")...`) becomes a file-arrival stream.
  *
  * Offsets are a count into the listing ordered by (modificationTime, path)
  * — the same contract as Spark's file stream source: files must land
  * atomically (write + rename), and a file back-dated before the committed
  * boundary is not picked up. Each batch reads only the newly-arrived
  * files, as whole-file chunks packed with the batch packer, through the
  * same PartitionReaderFactory as batch scans (so column pruning and
  * option-region row filtering apply unchanged).
  *
  * The reference is bounded-only (Boundedness::Bounded on every scan,
  * exon_file_scan_config.rs:58) — this is a Spark-native extension for
  * continuously-landing pipeline data.
  */
final case class GraftFilesOffset(count: Int) extends Offset {
  override def json(): String = s"""{"count":$count}"""
}

final class GraftMicroBatchStream(table: GraftTable, scan: GraftScan)
  extends MicroBatchStream {

  // Listing snapshot taken at latestOffset time: planInputPartitions slices
  // THIS listing, never a fresh one, so the files counted are exactly the
  // files read even if more land between the two calls. (A file back-dated
  // before a committed boundary — same-second writes with preserved mtimes —
  // is still the documented blind spot, as with Spark's file source.)
  @volatile private var snapshot: Seq[(FileStatus, Array[String])] = Nil

  private def sortedFiles(): Seq[(FileStatus, Array[String])] =
    table.listNow()._1
      .sortBy { case (st, _) => (st.getModificationTime, st.getPath.toString) }

  override def initialOffset(): Offset = GraftFilesOffset(0)

  override def latestOffset(): Offset = {
    snapshot = sortedFiles()
    GraftFilesOffset(snapshot.size)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"count":(\d+)\}""".r
    json.trim match {
      case m(n) => GraftFilesOffset(n.toInt)
      case other => throw new IllegalArgumentException(s"bad graft offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftFilesOffset].count
    val e = end.asInstanceOf[GraftFilesOffset].count
    val listed = if (snapshot.size >= e) snapshot else sortedFiles()
    scan.packWholeFiles(listed.slice(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = scan.readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
