package graft.sources

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** A format that can serialize records back to its text form (the Spark
  * equivalent of the reference's `COPY ... STORED AS FASTA/FASTQ` sink,
  * sinks/simple_record_sink.rs:81-119). Unlike the reference's single-file
  * sink, each task writes its own part file — parallel by construction.
  */
case object GraftCommitted extends WriterCommitMessage

trait WritableGraftFormat extends GraftFormat {
  /** Append one record (values in dataSchema order, nulls allowed where the
    * schema allows) to the output.
    */
  def writeRecord(values: Array[Any], out: StringBuilder): Unit
}

final class GraftWriteBuilder(table: GraftTable, format: WritableGraftFormat,
                              info: LogicalWriteInfo, options: Map[String, String])
  extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val dir = new Path(table.paths.head)
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      val fs = dir.getFileSystem(conf)
      if (doTruncate && fs.exists(dir)) fs.delete(dir, true)
      fs.mkdirs(dir)
      // Per-job temp namespace (Spark's FileOutputCommitter does the same):
      // two concurrent appends to one directory must not delete each
      // other's in-flight task files at job commit/abort.
      new GraftBatchWrite(format, table.paths.head, info.schema(),
        new SerializableHadoopConf(conf),
        options.getOrElse("compression", "none").toLowerCase,
        UUID.randomUUID().toString)
    }
  }
}

final class GraftBatchWrite(format: WritableGraftFormat, dir: String, schema: StructType,
                            conf: SerializableHadoopConf, compression: String,
                            jobId: String)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Map the incoming dataframe columns onto dataSchema positions by name.
    val srcIdx: Array[Int] = format.dataSchema.fieldNames.map { f =>
      schema.fieldNames.indexWhere(_.equalsIgnoreCase(f))
    }
    new GraftDataWriterFactory(format, dir, srcIdx, schema, conf, compression, jobId)
  }

  // Task outputs land in dir/_temporary/<jobId> and are renamed into place
  // on task commit, so a task that dies mid-write never leaves a visible
  // partial part file (listings skip '_'-prefixed names as an extra
  // guard). Job commit/abort clears only THIS job's temp subtree — so two
  // concurrent appends cannot delete each other's in-flight files — then
  // the parent if empty. Subtrees of a job whose JVM died without
  // commit/abort stay behind; the OPT-IN sweep below reclaims them, gated
  // on an explicit TTL because any mtime heuristic can misfire (object
  // stores report 0/unreliable directory mtimes, and a >TTL straggler
  // task would lose its in-flight files): set
  // spark.hadoop.graft.write.orphanTempTtlMs to a duration safely above
  // the longest job you run concurrently against the directory.
  override def commit(messages: Array[WriterCommitMessage]): Unit = cleanTemp()
  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanTemp()

  private def cleanTemp(): Unit = {
    val parent = new Path(dir, "_temporary")
    val tmp = new Path(parent, jobId)
    val fs = tmp.getFileSystem(conf.value)
    try {
      fs.delete(tmp, true)
      val ttl = conf.value.getLong("graft.write.orphanTempTtlMs", -1L)
      if (ttl > 0) {
        val cutoff = System.currentTimeMillis() - ttl
        fs.listStatus(parent).foreach { st =>
          // mtime 0 = filesystem doesn't track it; never sweep on a guess
          if (st.getModificationTime > 0 && st.getModificationTime < cutoff)
            fs.delete(st.getPath, true)
        }
      }
      if (fs.listStatus(parent).isEmpty) fs.delete(parent, false)
    } catch { case _: Throwable => () }
  }
}

final class GraftDataWriterFactory(format: WritableGraftFormat, dir: String,
                                   srcIdx: Array[Int], schema: StructType,
                                   conf: SerializableHadoopConf, compression: String,
                                   jobId: String)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(format, dir, srcIdx, schema, conf, compression, partitionId,
      taskId, jobId)
}

final class GraftDataWriter(format: WritableGraftFormat, dir: String,
                            srcIdx: Array[Int], schema: StructType,
                            conf: SerializableHadoopConf, compression: String,
                            partitionId: Int, taskId: Long, jobId: String)
  extends DataWriter[InternalRow] {

  private val ext = format.defaultExtensions.head + (compression match {
    case "gzip" => ".gz"
    case "zstd" => ".zst"
    case "none" | "" => ""
    case other => throw new IllegalArgumentException(
      s"unsupported write compression '$other' (gzip, zstd, none)")
  })
  private val fileName =
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.$ext"
  // written under the job's temp namespace, renamed into place at task commit
  private val tmpPath = new Path(new Path(new Path(dir, "_temporary"), jobId), fileName)
  private val path = new Path(dir, fileName)

  private var opened = false
  private lazy val out: OutputStream = {
    opened = true
    val fs = tmpPath.getFileSystem(conf.value)
    val raw = fs.create(tmpPath, true)
    compression match {
      case "gzip" => new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
      case _ => new BufferedOutputStream(raw, 1 << 16)
    }
  }

  private val sb = new StringBuilder(1 << 14)
  private val dataTypes = format.dataSchema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val values = new Array[Any](srcIdx.length)
    var i = 0
    while (i < srcIdx.length) {
      val s = srcIdx(i)
      values(i) = if (s < 0 || row.isNullAt(s)) null else row.get(s, dataTypes(i))
      i += 1
    }
    sb.setLength(0)
    format.writeRecord(values, sb)
    out.write(sb.toString.getBytes(UTF_8))
  }

  override def commit(): WriterCommitMessage = {
    // only close (and thereby create) the file if this task wrote anything
    if (opened) {
      out.close()
      val fs = path.getFileSystem(conf.value)
      if (!fs.rename(tmpPath, path))
        throw new java.io.IOException(s"failed to commit $tmpPath -> $path")
    }
    GraftCommitted
  }
  override def abort(): Unit = {
    if (opened) {
      try out.close() catch { case _: Throwable => () }
      val fs = tmpPath.getFileSystem(conf.value)
      fs.delete(tmpPath, false)
    }
  }
  override def close(): Unit = ()
}
