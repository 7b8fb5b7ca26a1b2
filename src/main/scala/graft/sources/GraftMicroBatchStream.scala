package graft.sources

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** Micro-batch streaming over a graft table's file listing: every format
  * (`spark.readStream.format("fasta")...`) becomes a file-arrival stream.
  *
  * An offset is the (modificationTime, path) key of the last file included
  * — not a count. A batch is "files with key in (start, end]", so deleting
  * an already-processed file can never shift the window onto different
  * files after a restart (a bare index into the re-listed sequence would
  * re-read or skip). Files must land atomically (write + rename); a file
  * back-dated to or before a committed boundary key is not picked up —
  * the same documented blind spot as Spark's file source.
  *
  * Each batch reads only the newly-arrived files, as whole-file chunks
  * packed with the batch packer, through the same PartitionReaderFactory
  * as batch scans (so column pruning and option-region row filtering
  * apply unchanged).
  *
  * The reference is bounded-only (Boundedness::Bounded on every scan,
  * exon_file_scan_config.rs:58) — this is a Spark-native extension for
  * continuously-landing pipeline data.
  */
final case class GraftFilesOffset(mtime: Long, path: String) extends Offset {
  override def json(): String =
    s"""{"mtime":$mtime,"path":"${GraftFilesOffset.escape(path)}"}"""
}

object GraftFilesOffset {
  /** Sorts before every real file key. */
  val start: GraftFilesOffset = GraftFilesOffset(Long.MinValue, "")

  private[sources] def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      // control chars (newline in a filename!) would break the one-line
      // offset log and the (.*) parse regex — JSON-escape them
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
  private[sources] def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"' => sb.append('"'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val pat = """\{"mtime":(-?\d+),"path":"(.*)"\}""".r

  def parse(json: String): GraftFilesOffset = json.trim match {
    case pat(m, p) =>
      // a corrupted escape (truncated \uXXXX, bad hex) must surface as a
      // bad offset, not an index/number error from inside unescape
      try GraftFilesOffset(m.toLong, unescape(p))
      catch {
        case e @ (_: IndexOutOfBoundsException | _: NumberFormatException) =>
          throw new IllegalArgumentException(s"bad graft offset: $json", e)
      }
    case other => throw new IllegalArgumentException(s"bad graft offset: $other")
  }

  def keyOf(st: FileStatus): (Long, String) =
    (st.getModificationTime, st.getPath.toString)

  def lte(key: (Long, String), o: GraftFilesOffset): Boolean =
    key._1 < o.mtime || (key._1 == o.mtime && key._2 <= o.path)
}

final class GraftMicroBatchStream(table: GraftTable, scan: GraftScan)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  // Listing snapshot taken at latestOffset time: planInputPartitions slices
  // THIS listing when it still covers the end boundary, so the files
  // keyed are exactly the files read even if more land between the two
  // calls; after a restart it re-lists and filters by key.
  @volatile private var snapshot: Seq[(FileStatus, Array[String])] = Nil

  // High-water mark: offsets must never regress, even if the newest
  // processed file is deleted between triggers (a re-listed max below the
  // committed boundary would make Spark commit the regressed offset and
  // re-read anything that later lands in the reopened window).
  @volatile private var floor: GraftFilesOffset = GraftFilesOffset.start

  private def maxOffset(a: GraftFilesOffset, b: GraftFilesOffset): GraftFilesOffset =
    if (GraftFilesOffset.lte((a.mtime, a.path), b)) b else a

  private def sortedFiles(): Seq[(FileStatus, Array[String])] =
    table.listNow()._1.sortBy { case (st, _) => GraftFilesOffset.keyOf(st) }

  override def initialOffset(): Offset = GraftFilesOffset.start

  /** Committed-prefix skip: the boundary-key invariant (offsets never
    * regress, a batch is "keys in (start, end]") means files at or below
    * the floor can never be part of a future batch — so each trigger
    * filters the listing down to keys PAST the floor before sorting.
    * At a 100 TB landing zone with ~10^5 accumulated files the per-trigger
    * cost drops from an O(n log n) re-sort of everything ever landed to
    * O(n) key compares + a sort of only the newly-arrived tail. The
    * directory walk itself remains O(n) per trigger — the same bound as
    * Spark's FileStreamSource; land files under a date-partitioned layout
    * and point the stream at the active prefix to bound n.
    */
  /** `option("maxFileAge", "7d")`: ignore files older than the age,
    * measured against the newest file in the listing — Spark file-source
    * semantics. Lets a stream pointed at a long-lived landing zone start
    * from recent data instead of replaying years of history; like Spark's,
    * a file that was ever past the cutoff never becomes eligible (the
    * cutoff is monotone because the max mtime only grows).
    */
  private val maxFileAgeMs: Option[Long] = table.readOption("maxfileage")
    .map(org.apache.spark.network.util.JavaUtils.timeStringAsMs)

  private def newFilesAfter(base: GraftFilesOffset): Seq[(FileStatus, Array[String])] = {
    val all = table.listNow()._1
    val cutoff = maxFileAgeMs.map { age =>
      all.foldLeft(Long.MinValue) { case (m, (st, _)) =>
        math.max(m, st.getModificationTime)
      } - age
    }
    val fresh = all
      .filter { case (st, _) =>
        !GraftFilesOffset.lte(GraftFilesOffset.keyOf(st), base) &&
          cutoff.forall(st.getModificationTime >= _)
      }
    GraftMicroBatchStream.maxTriggerSortedFiles
      .accumulateAndGet(fresh.size, math.max)
    fresh.sortBy { case (st, _) => GraftFilesOffset.keyOf(st) }
  }

  override def latestOffset(): Offset = {
    snapshot = newFilesAfter(floor)
    val listed = snapshot.lastOption
      .map { case (st, _) =>
        val (m, p) = GraftFilesOffset.keyOf(st); GraftFilesOffset(m, p)
      }
      .getOrElse(floor)
    floor = maxOffset(floor, listed)
    floor
  }

  // ---- admission control: maxFilesPerTrigger / maxBytesPerTrigger --------

  /** `option("maxFilesPerTrigger", n)` / `option("maxBytesPerTrigger",
    * "128m")`: bound each micro-batch like Spark's file source does — at a
    * landing zone a burst of thousands of files otherwise becomes one
    * giant batch whose failure loses hours of progress.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val mf = table.readOption("maxfilespertrigger").map(_.trim.toInt)
    val mb = table.readOption("maxbytespertrigger")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
    (mf, mb) match {
      case (Some(f), Some(b)) =>
        ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
      case (Some(f), None) => ReadLimit.maxFiles(f)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      case _ => ReadLimit.allAvailable()
    }
  }

  /** AvailableNow cap: the drain processes only files present at prepare
    * time, so it terminates even while files keep landing.
    */
  @volatile private var availableNowCap: GraftFilesOffset = null

  override def prepareForTriggerAvailableNow(): Unit = {
    val max = table.listNow()._1.foldLeft(GraftFilesOffset.start) {
      case (m, (st, _)) =>
        val (mt, p) = GraftFilesOffset.keyOf(st)
        if (GraftFilesOffset.lte((mt, p), m)) m else GraftFilesOffset(mt, p)
    }
    availableNowCap = maxOffset(floor, max)
  }

  private def applyLimit(files: Seq[(FileStatus, Array[String])],
                         limit: ReadLimit): Seq[(FileStatus, Array[String])] =
    limit match {
      case f: ReadMaxFiles => files.take(f.maxFiles())
      case b: ReadMaxBytes =>
        // always admit at least one file or the stream can never advance
        var total = 0L
        files.takeWhile { case (st, _) =>
          val first = total == 0L
          total += st.getLen
          first || total <= b.maxBytes()
        }
      case c: CompositeReadLimit => c.getReadLimits.foldLeft(files)(applyLimit)
      case _ => files
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftFilesOffset]
    // start is authoritative for this batch; floor may lag it on restart
    val base = maxOffset(floor, s)
    var fresh = newFilesAfter(base)
    val cap = availableNowCap
    if (cap != null)
      fresh = fresh.filter { case (st, _) =>
        GraftFilesOffset.lte(GraftFilesOffset.keyOf(st), cap)
      }
    fresh = applyLimit(fresh, limit)
    snapshot = fresh
    val listed = fresh.lastOption
      .map { case (st, _) =>
        val (m, p) = GraftFilesOffset.keyOf(st); GraftFilesOffset(m, p)
      }
      .getOrElse(base)
    floor = maxOffset(floor, listed)
    floor
  }

  private val legacyCountPat = """\{"count":(\d+)\}""".r

  override def deserializeOffset(json: String): Offset = {
    val o = json.trim match {
      // Pre-boundary-key checkpoints stored a bare count into the sorted
      // listing; convert to the Nth file's boundary key so old streams
      // restart instead of dying on "bad graft offset" (assumes no
      // processed file was deleted — exactly the old format's own caveat).
      case legacyCountPat(n) =>
        val files = sortedFiles()
        val idx = math.min(n.toInt, files.size) - 1
        if (idx < 0) GraftFilesOffset.start
        else {
          val (m, p) = GraftFilesOffset.keyOf(files(idx)._1)
          GraftFilesOffset(m, p)
        }
      case other => GraftFilesOffset.parse(other)
    }
    floor = maxOffset(floor, o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftFilesOffset]
    val e = end.asInstanceOf[GraftFilesOffset]
    val listed =
      if (snapshot.exists { case (st, _) =>
        GraftFilesOffset.keyOf(st) == (e.mtime, e.path) } || e == GraftFilesOffset.start)
        snapshot
      else sortedFiles()
    // Replay-safe maxFileAge: the re-list fallback (restart mid-batch) must
    // not resurrect history the original batch's cutoff excluded. The
    // original cutoff (maxListedMtime - age) is >= (end.mtime - age), so
    // filtering by the end-relative cutoff keeps every originally-admitted
    // file; it can only re-admit borderline old files when an admission
    // limit made end older than the newest listing — each still processed
    // at most once.
    val cutoff = maxFileAgeMs.map(e.mtime - _)
    val batch = listed.filter { case (st, _) =>
      val k = GraftFilesOffset.keyOf(st)
      !GraftFilesOffset.lte(k, s) && GraftFilesOffset.lte(k, e) &&
        cutoff.forall(st.getModificationTime >= _)
    }
    scan.packWholeFiles(batch)
  }

  override def createReaderFactory(): PartitionReaderFactory = scan.readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object GraftMicroBatchStream {
  /** Test instrumentation: the most files any trigger since the last reset
    * had to sort AFTER the committed-prefix filter (proves steady-state
    * triggers don't re-sort the whole accumulated directory; the first
    * trigger of a query run still sorts everything once, floor = start).
    */
  private[sources] val maxTriggerSortedFiles =
    new java.util.concurrent.atomic.AtomicInteger(-1)
}
