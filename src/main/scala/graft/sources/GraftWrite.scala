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

  /** Header block ('#' lines etc.) written once at the top of each file. */
  def fileHeader: Option[String] = None

  /** Flat-file per-record index line (the `.fai` family): given the record
    * values and the byte offset where the record starts in the uncompressed
    * output, return one index line. Consulted for uncompressed writes and
    * for bgzf writes of `writesFai` formats (`.fai` offsets are
    * uncompressed-domain in both cases — under bgzf the sibling `.gzi`
    * does the compressed mapping); when any line is produced the task
    * commits a sibling `<part>.fai` alongside the data file.
    */
  def faiLine(values: Array[Any], recordStart: Long): Option[String] = None

  /** True when faiLine produces a usable `.fai` — enables
    * `option("compression","bgzf")` on non-coordinate formats (FASTA): the
    * sink then commits `.fai` + `.gzi` siblings so the compressed output
    * still supports `samtools faidx`-style region seeks.
    */
  def writesFai: Boolean = false
}

/** A writable format whose records carry genomic coordinates, enabling the
  * bgzf+`.tbi` sink shape: `option("compression","bgzf")` writes seekable
  * bgzip part files, each with its own sibling tabix index, so region
  * queries prune the sink's own output. Sharded per task — the
  * distributed analog of `bgzip && tabix`, which neither tool nor the
  * reference can produce in parallel.
  */
trait IndexableGraftFormat extends WritableGraftFormat {
  /** (sequence name, 0-based begin, 0-based-exclusive end) of one record. */
  def recordRegion(values: Array[Any]): (String, Long, Long)

  /** Tabix preset header (format flags, seq col, begin col, end col) for
    * external consumers; defaults to the VCF preset.
    */
  def tabixPreset: (Int, Int, Int, Int) = (2, 1, 2, 0)
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

    // writeStream.format("fasta")... — append-only like Spark's file sink.
    // Each epoch's part names are deterministic (epoch, partition), so a
    // replayed epoch after failure overwrites its own files: idempotent
    // exactly-once output without a metadata log.
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (doTruncate)
        throw new UnsupportedOperationException(
          s"${format.shortName} streaming sink is append-only (like Spark's " +
            "file sink); use outputMode(\"append\")")
      val dir = new Path(table.paths.head)
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      new GraftStreamingWrite(format, table.paths.head, info.schema(),
        new SerializableHadoopConf(conf),
        options.getOrElse("compression", "none").toLowerCase,
        info.queryId())
    }
  }
}

/** Streaming flavor of [[GraftBatchWrite]]: one job-temp namespace per
  * (queryId, epoch), deterministic part names per (epoch, partition).
  */
final class GraftStreamingWrite(format: WritableGraftFormat, dir: String,
                                schema: StructType, conf: SerializableHadoopConf,
                                compression: String, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val srcIdx: Array[Int] = format.dataSchema.fieldNames.map { f =>
      schema.fieldNames.indexWhere(_.equalsIgnoreCase(f))
    }
    new GraftStreamingDataWriterFactory(format, dir, srcIdx, schema, conf,
      compression, queryId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftWriteTemp.clean(dir, s"$queryId-$epochId", conf.value)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftWriteTemp.clean(dir, s"$queryId-$epochId", conf.value)
}

final class GraftStreamingDataWriterFactory(format: WritableGraftFormat, dir: String,
                                            srcIdx: Array[Int], schema: StructType,
                                            conf: SerializableHadoopConf,
                                            compression: String, queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(format, dir, srcIdx, schema, conf, compression,
      partitionId, taskId, s"$queryId-$epochId", epoch = Some(epochId),
      streamQueryId = Some(queryId))
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
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteTemp.clean(dir, jobId, conf.value)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteTemp.clean(dir, jobId, conf.value)
}

/** Job-temp cleanup shared by every graft sink (text and BAM). */
object GraftWriteTemp {
  def clean(dir: String, jobId: String,
            conf: org.apache.hadoop.conf.Configuration): Unit = {
    val parent = new Path(dir, "_temporary")
    val tmp = new Path(parent, jobId)
    val fs = tmp.getFileSystem(conf)
    try {
      fs.delete(tmp, true)
      val ttl = conf.getLong("graft.write.orphanTempTtlMs", -1L)
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
                            partitionId: Int, taskId: Long, jobId: String,
                            epoch: Option[Long] = None,
                            streamQueryId: Option[String] = None)
  extends DataWriter[InternalRow] {

  private val ext = format.defaultExtensions.head + (compression match {
    case "gzip" | "bgzf" => ".gz"
    case "zstd" => ".zst"
    case "none" | "" => ""
    case other => throw new IllegalArgumentException(
      s"unsupported write compression '$other' (gzip, bgzf, zstd, none)")
  })
  if (compression == "bgzf" &&
      !(format.isInstanceOf[IndexableGraftFormat] || format.writesFai))
    throw new IllegalArgumentException(
      s"${format.shortName}: bgzf compression is for indexable formats " +
        "(the point is the sibling .tbi or .fai+.gzi); use gzip here")
  // bgzf mode family: coordinate formats index with tabix; fai formats
  // (FASTA) keep uncompressed-domain .fai offsets + a .gzi block map
  private val bgzfFai = compression == "bgzf" &&
    !format.isInstanceOf[IndexableGraftFormat]
  // Batch parts get a random suffix (append-friendly, collision-free);
  // streaming parts are DETERMINISTIC per (queryId, epoch, partition) so a
  // replayed epoch overwrites its OWN output instead of duplicating it —
  // the queryId prefix scopes that overwrite: a different query (fresh
  // checkpoint, epochs restarting at 0) appending to the same directory
  // can never clobber this one's committed parts.
  private val fileName = epoch match {
    case Some(e) =>
      val qid = streamQueryId.getOrElse("q")
        .replaceAll("[^A-Za-z0-9]", "").take(8)
      f"part-$qid%s-$e%06d-$partitionId%05d.$ext"
    case None =>
      f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.$ext"
  }
  // written under the job's temp namespace, renamed into place at task
  // commit; concurrent attempts of one streaming (epoch, partition) get
  // distinct temp names (taskId) — the commit coordinator lets only one
  // attempt rename into place
  private val tmpName = if (epoch.isDefined) s"$fileName.t$taskId" else fileName
  private val tmpPath = new Path(new Path(new Path(dir, "_temporary"), jobId), tmpName)
  private val path = new Path(dir, fileName)

  private var opened = false
  private var raw: OutputStream = _
  private var bgzf: BgzfWriter = _
  private var tbi: TabixWriter = _
  // tabix precondition: per file, chroms grouped and starts ascending
  private var lastTid = -1
  private var lastBeg = -1L

  private lazy val out: OutputStream = {
    opened = true
    val fs = tmpPath.getFileSystem(conf.value)
    raw = fs.create(tmpPath, true)
    val stream = compression match {
      case "gzip" => new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
      case "bgzf" =>
        bgzf = new BgzfWriter(new BufferedOutputStream(raw, 1 << 16))
        tbi = if (bgzfFai) null else new TabixWriter()
        null
      case _ => new BufferedOutputStream(raw, 1 << 16)
    }
    format.fileHeader.foreach { h =>
      val b = h.getBytes(UTF_8)
      if (bgzf != null) bgzf.write(b) else stream.write(b)
      plainOffset += b.length
    }
    stream
  }

  // uncompressed byte position (drives faiLine): plain-file position for
  // uncompressed writes, pre-compression position for bgzf+fai writes
  // (the .gzi maps it to compressed blocks)
  private var plainOffset = 0L
  private val faiSb =
    if (compression == "none" || compression.isEmpty || bgzfFai)
      new StringBuilder
    else null

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
    val bytes = sb.toString.getBytes(UTF_8)
    out // force open (header)
    if (bgzf != null && tbi == null) {
      // bgzf+fai mode: uncompressed-domain index line, compressed output
      if (faiSb != null)
        format.faiLine(values, plainOffset).foreach(faiSb.append)
      bgzf.write(bytes)
      plainOffset += bytes.length
    } else if (bgzf != null) {
      val (chrom, beg0, end0) = format.asInstanceOf[IndexableGraftFormat]
        .recordRegion(values)
      val t = tbi.tid(chrom)
      // a broken ordering would produce a silently-wrong index — refuse
      if (t < lastTid || (t == lastTid && beg0 < lastBeg) ||
          (t != lastTid && t != lastTid + 1 && lastTid >= 0))
        throw new IllegalArgumentException(
          s"bgzf+tabix write requires rows sorted by (chrom, pos) within " +
            s"each partition and chroms not interleaved; got $chrom:${beg0 + 1} " +
            "after a later record. Sort with " +
            "df.repartitionByRange(...).sortWithinPartitions(\"chrom\", \"pos\")")
      lastTid = t; lastBeg = beg0
      val vs = bgzf.virtualPos
      bgzf.write(bytes)
      tbi.add(t, beg0, end0, vs, bgzf.virtualPos)
    } else {
      if (faiSb != null)
        format.faiLine(values, plainOffset).foreach(faiSb.append)
      out.write(bytes)
      plainOffset += bytes.length
    }
  }

  override def commit(): WriterCommitMessage = {
    // only close (and thereby create) the file if this task wrote anything
    if (opened) {
      val fs = path.getFileSystem(conf.value)
      // a replayed streaming epoch re-commits the same deterministic names:
      // clear the previous attempt's files so rename lands (idempotent)
      if (epoch.isDefined) {
        Seq(path, path.suffix(".tbi"), path.suffix(".fai"), path.suffix(".gzi"))
          .foreach(p => if (fs.exists(p)) fs.delete(p, false))
      }
      if (bgzf != null) {
        bgzf.finish()
        raw.close()
        if (tbi != null) {
          // sibling index, committed with the same temp+rename discipline
          val tbiTmp = tmpPath.suffix(".tbi")
          val ts = fs.create(tbiTmp, true)
          val (pf, pc, pb, pe) = format.asInstanceOf[IndexableGraftFormat].tabixPreset
          try tbi.write(ts, pf, pc, pb, pe) finally ts.close()
          if (!fs.rename(tbiTmp, path.suffix(".tbi")))
            throw new java.io.IOException(s"failed to commit $tbiTmp")
        } else {
          // bgzf+fai mode: sibling .gzi from the writer's own block map
          val gziTmp = tmpPath.suffix(".gzi")
          val gs = fs.create(gziTmp, true)
          try GziIndex.write(gs, bgzf.blockIndex) finally gs.close()
          if (!fs.rename(gziTmp, path.suffix(".gzi")))
            throw new java.io.IOException(s"failed to commit $gziTmp")
        }
      } else {
        out.close()
      }
      if (faiSb != null && faiSb.nonEmpty) {
        val faiTmp = tmpPath.suffix(".fai")
        val fos = fs.create(faiTmp, true)
        try fos.write(faiSb.toString.getBytes(UTF_8)) finally fos.close()
        if (!fs.rename(faiTmp, path.suffix(".fai")))
          throw new java.io.IOException(s"failed to commit $faiTmp")
      }
      if (!fs.rename(tmpPath, path))
        throw new java.io.IOException(s"failed to commit $tmpPath -> $path")
    }
    GraftCommitted
  }
  override def abort(): Unit = {
    if (opened) {
      try { if (bgzf != null) { bgzf.finish(); raw.close() } else out.close() }
      catch { case _: Throwable => () }
      val fs = tmpPath.getFileSystem(conf.value)
      fs.delete(tmpPath, false)
      if (bgzf != null) fs.delete(tmpPath.suffix(".tbi"), false)
      if (bgzf != null) fs.delete(tmpPath.suffix(".gzi"), false)
      if (faiSb != null) fs.delete(tmpPath.suffix(".fai"), false)
    }
  }
  override def close(): Unit = ()
}
