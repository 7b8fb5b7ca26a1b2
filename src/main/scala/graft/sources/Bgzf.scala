package graft.sources

import java.io.InputStream
import java.util.zip.Inflater
import org.apache.hadoop.fs.FSDataInputStream

/** BGZF (blocked gzip) primitives. A BGZF file is a sequence of independent
  * gzip members, each carrying its compressed size in a BC extra subfield, so
  * a reader can seek to any block boundary. A "virtual position" addresses
  * (block file offset << 16 | offset inside the decompressed block) — the
  * coordinate system used by tabix/.bai/.csi indexes.
  *
  * Format is public (SAM spec §4.1); reimplemented here, not ported: the
  * reference delegates to noodles (streaming_bgzf.rs:22-80).
  */
object Bgzf {

  final case class Block(data: Array[Byte], compressedSize: Int)

  /** One block's compressed payload + sizes, read off the stream but not
    * yet inflated — the unit of work the idle-core inflate pool takes
    * (see [[BgzfBlocks]]). `cdata` is the deflate payload only (no gzip
    * framing), so inflation needs no further stream access.
    */
  final case class RawBlock(cdata: Array[Byte], isize: Int, compressedSize: Int)

  /** Non-destructive BGZF sniff on a pushback stream: true iff the next
    * bytes are a gzip member header whose FEXTRA block carries the BC
    * subfield (SAM spec §4.1). Reads at most 12 + XLEN bytes and unreads
    * them all before returning, so the caller's stream position is
    * unchanged either way. XLEN > 498 (pushback capacity 512 minus the
    * fixed header) is treated as not-BGZF — real BGZF writers emit XLEN=6.
    */
  def looksLikeBgzf(in: java.io.PushbackInputStream): Boolean = {
    val head = new Array[Byte](12)
    var got = 0
    while (got < 12) {
      val n = in.read(head, got, 12 - got)
      if (n < 0) { if (got > 0) in.unread(head, 0, got); return false }
      got += n
    }
    def bail(extra: Array[Byte], extraLen: Int): Boolean = {
      if (extraLen > 0) in.unread(extra, 0, extraLen)
      in.unread(head, 0, 12)
      false
    }
    if ((head(0) & 0xff) != 31 || (head(1) & 0xff) != 139 ||
        (head(2) & 0xff) != 8 || (head(3) & 0x04) == 0)
      return bail(null, 0)
    val xlen = u16(head, 10)
    if (xlen > 498) return bail(null, 0)
    val extra = new Array[Byte](xlen)
    got = 0
    while (got < xlen) {
      val n = in.read(extra, got, xlen - got)
      if (n < 0) return bail(extra, got)
      got += n
    }
    var i = 0
    var found = false
    while (i + 4 <= xlen && !found) {
      val slen = u16(extra, i + 2)
      if ((extra(i) & 0xff) == 66 && (extra(i + 1) & 0xff) == 67 && slen == 2)
        found = true
      else i += 4 + slen
    }
    in.unread(extra, 0, xlen)
    in.unread(head, 0, 12)
    found
  }

  /** Read and inflate one BGZF block at the stream's current position.
    * Returns null at clean EOF. Allocates a fresh Inflater — block-loop
    * callers should use [[BgzfBlocks]] (JNI inflater init per 18 KB
    * block is a measurable tax on a multi-GB scan).
    */
  def readBlock(in: InputStream): Block = {
    val inf = new Inflater(true)
    try readBlock(in, inf) finally inf.end()
  }

  /** Reusing variant: `inf` is reset before use and stays owned by the
    * caller.
    */
  def readBlock(in: InputStream, inf: Inflater): Block = {
    val rb = readRawBlock(in)
    if (rb == null) null else Block(inflateRaw(rb, inf), rb.compressedSize)
  }

  /** Read one block's framing + compressed payload WITHOUT inflating (the
    * stream-ordered half of the read; inflation is order-free and can run
    * on any core). Returns null at clean EOF.
    */
  def readRawBlock(in: InputStream): RawBlock = {
    val header = new Array[Byte](12)
    var got = 0
    while (got < 12) {
      val n = in.read(header, got, 12 - got)
      if (n < 0) { if (got == 0) return null else throw truncated() }
      got += n
    }
    require((header(0) & 0xff) == 31 && (header(1) & 0xff) == 139,
      "not a BGZF/gzip block")
    val xlen = u16(header, 10)
    val extra = readFully(in, xlen)
    // find BC subfield -> BSIZE (total block size - 1)
    var bsize = -1
    var i = 0
    while (i + 4 <= extra.length && bsize < 0) {
      val si1 = extra(i) & 0xff; val si2 = extra(i + 1) & 0xff
      val slen = u16(extra, i + 2)
      if (si1 == 66 && si2 == 67 && slen == 2) bsize = u16(extra, i + 4) + 1
      i += 4 + slen
    }
    require(bsize > 0, "BGZF block missing BC subfield (plain gzip?)")
    // layout: 12-byte header + xlen extra + cdata + crc32 + isize == bsize
    val cdata = readFully(in, bsize - 12 - xlen - 8)
    val tail = readFully(in, 8)
    RawBlock(cdata, u32(tail, 4).toInt, bsize)
  }

  /** Inflate one raw block's payload. `inf` is reset before use and stays
    * owned by the caller.
    */
  def inflateRaw(rb: RawBlock, inf: Inflater): Array[Byte] = {
    val isize = rb.isize
    val out = new Array[Byte](isize)
    if (isize > 0) {
      inf.reset()
      inf.setInput(rb.cdata)
      var off = 0
      while (off < isize && !inf.finished()) {
        val n = inf.inflate(out, off, isize - off)
        if (n == 0 && inf.needsInput())
          throw new java.io.EOFException("corrupt BGZF block: inflater stalled")
        off += n
      }
    }
    out
  }

  private def truncated() = new java.io.EOFException("truncated BGZF block")

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) throw truncated()
      got += r
    }
    b
  }

  @inline private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  @inline private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong) | (u16(b, i + 2).toLong << 16)

  /** Parse a candidate BGZF block header at `b(i)`, returning its total
    * block size (BSIZE+1) or -1 when the bytes there are not a plausible
    * header. Pure-buffer validation used by the split-point scan.
    */
  private def headerBsizeAt(b: Array[Byte], i: Int, avail: Int): Int = {
    if (i + 12 > avail) return -1
    if ((b(i) & 0xff) != 31 || (b(i + 1) & 0xff) != 139 ||
        (b(i + 2) & 0xff) != 8 || (b(i + 3) & 4) == 0) return -1
    val xlen = u16(b, i + 10)
    if (xlen < 6 || i + 12 + xlen > avail) return -1
    var j = i + 12
    val xend = i + 12 + xlen
    var bsize = -1
    while (j + 4 <= xend && bsize < 0) {
      val si1 = b(j) & 0xff; val si2 = b(j + 1) & 0xff
      val slen = u16(b, j + 2)
      if (si1 == 66 && si2 == 67 && slen == 2 && j + 6 <= xend)
        bsize = u16(b, j + 4) + 1
      j += 4 + slen
    }
    if (bsize < 12 + xlen + 8 || bsize > (1 << 16)) -1 else bsize
  }

  /** Find the first BGZF block boundary at/after raw offset `c` by scanning
    * for a validated header (magic + FEXTRA + BC subfield) whose implied
    * NEXT block also validates (or lands exactly at EOF) — the two-header
    * chain makes a false positive inside compressed payload astronomically
    * unlikely (the hadoop-bam technique). The true boundary is at most one
    * block (64 KiB) away, so one bounded positioned read suffices. Returns
    * -1 when no boundary exists at/after `c` (offset inside the last
    * block).
    */
  def findBlockAtOrAfter(raw: FSDataInputStream, c: Long, fileSize: Long): Long = {
    if (c >= fileSize) return -1
    if (c == 0) return 0
    val win = math.min(fileSize - c, (3L << 16) + 1024).toInt
    val b = new Array[Byte](win)
    raw.readFully(c, b, 0, win)
    var i = 0
    // the first real boundary is within one max-size block of c
    val scanMax = math.min(win - 18, 1 << 16)
    while (i <= scanMax) {
      val bs = headerBsizeAt(b, i, win)
      if (bs > 0) {
        val nextAbs = c + i + bs
        if (nextAbs == fileSize || headerBsizeAt(b, i + bs, win) > 0)
          return c + i
      }
      i += 1
    }
    -1
  }

  /** Cheap sniff (mark/reset, no bytes consumed): gzip magic + FEXTRA flag
    * + a BC-first extra subfield — the layout every BGZF writer (htslib,
    * this repo's BgzfWriter) emits. A BGZF file with BC not first would
    * sniff false and take the generic gzip path: slower, still correct.
    */
  def looksLikeBgzf(in: java.io.BufferedInputStream): Boolean = {
    in.mark(16)
    try {
      val h = new Array[Byte](14)
      var got = 0
      while (got < 14) {
        val n = in.read(h, got, 14 - got)
        if (n < 0) return false
        got += n
      }
      (h(0) & 0xff) == 31 && (h(1) & 0xff) == 139 && (h(3) & 4) != 0 &&
        u16(h, 10) >= 6 && h(12) == 66 && h(13) == 67
    } finally in.reset()
  }
}

/** Executor-shared inflate pool for BGZF blocks — blocks are independent
  * gzip members, so a scan's inflation is order-free even though its
  * record parse is strictly sequential. At narrow widths (the w1-w4
  * regime: one big unsplittable-ish file, most cores idle) the profiled
  * wall is single-thread Inflater.inflate (~50-60% of BAM/FASTQ-bgzf task
  * samples); handing blocks to idle cores leaves the task thread IO- and
  * parse-bound. Same discipline as MzMlFormat.decodePool: submission is
  * gated LOCK-FREE on (in-flight pool decodes + live BGZF readers) staying
  * under the core count, so a full-width scan (readers == cores) submits
  * nothing and is sequential BY CONSTRUCTION; the SynchronousQueue +
  * CallerRunsPolicy pair backstops the gate's racy read (a saturated pool
  * inflates on the caller, never queues).
  */
private[sources] object BgzfPool {
  val poolSize: Int = Runtime.getRuntime.availableProcessors()

  /** Live BGZF block cursors in this JVM — the gate's estimate of cores
    * already occupied by reader task threads. Conservative over-count (a
    * reader blocked on IO still counts) errs toward sequential inflate,
    * never toward oversubscription.
    */
  private val activeReaders = new java.util.concurrent.atomic.AtomicInteger(0)

  /** In-flight async inflates, tracked lock-free (ThreadPoolExecutor's
    * getActiveCount takes the pool's mainLock — a per-block cost the gate
    * must not pay).
    */
  private val activeDecodes = new java.util.concurrent.atomic.AtomicInteger(0)

  private lazy val pool: java.util.concurrent.ThreadPoolExecutor = {
    val p = new java.util.concurrent.ThreadPoolExecutor(poolSize, poolSize,
      30L, java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.SynchronousQueue[Runnable](),
      (r: Runnable) => {
        val t = new Thread(r, "graft-bgzf-inflate"); t.setDaemon(true); t
      },
      new java.util.concurrent.ThreadPoolExecutor.CallerRunsPolicy())
    p.allowCoreThreadTimeOut(true)
    p
  }

  /** Per-pool-thread Inflater: reset per block, never end()-ed explicitly —
    * native state is released by the zip Cleaner when an idle pool thread
    * times out. (Task-owned Inflaters keep their explicit end().)
    */
  private val scratch: ThreadLocal[Inflater] =
    ThreadLocal.withInitial(() => new Inflater(true))

  /** GRAFT_BGZF_DEBUG=1 traces cursor creation and gate decisions. */
  val debug: Boolean = sys.env.contains("GRAFT_BGZF_DEBUG")

  /** Register a cursor with the reader count for the lifetime of its Spark
    * task (no-op off-task, e.g. direct unit-test iteration).
    */
  def trackReader(): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach { tc =>
      activeReaders.incrementAndGet()
      tc.addTaskCompletionListener[Unit](_ => activeReaders.decrementAndGet())
    }

  /** Submit a batch of blocks for async inflation when a core is idle;
    * null when the gate is closed (caller inflates inline, sequentially).
    * One pool handoff covers the whole batch — the SynchronousQueue
    * rendezvous + FutureTask park/unpark costs ~40 µs per submission
    * (measured: per-block submission ATE the b15 overlap win), so blocks
    * ride in groups and each completes its own CompletableFuture as it
    * inflates (block-granular joins, group-granular handoff).
    */
  def tryAsyncBatch(rbs: Array[Bgzf.RawBlock], n: Int)
      : Array[java.util.concurrent.CompletableFuture[Array[Byte]]] = {
    if (debug)
      System.err.println(s"BGZF-GATE decodes=${activeDecodes.get} readers=${activeReaders.get} pool=$poolSize")
    if (activeDecodes.get + activeReaders.get >= poolSize) return null
    val futs = new Array[java.util.concurrent.CompletableFuture[Array[Byte]]](n)
    var i = 0
    while (i < n) {
      futs(i) = new java.util.concurrent.CompletableFuture[Array[Byte]]()
      i += 1
    }
    activeDecodes.incrementAndGet()
    pool.execute { () =>
      try {
        val inf = scratch.get()
        var k = 0
        while (k < n) {
          try futs(k).complete(Bgzf.inflateRaw(rbs(k), inf))
          catch { case t: Throwable => futs(k).completeExceptionally(t) }
          k += 1
        }
      } finally activeDecodes.decrementAndGet()
    }
    futs
  }

  /** Generic sibling of [[tryAsyncBatch]] for non-BGZF decode work that is
    * order-free relative to its consumer (CRAM container decode rides
    * this). Shares the SAME gate and counters — one global idle-core
    * decode budget across all formats, so concurrent scans of different
    * formats cannot oversubscribe the machine between them. Returns null
    * when the gate is closed (caller runs the work inline, sequentially).
    */
  def tryAsyncWork[T](work: () => T)
      : java.util.concurrent.CompletableFuture[T] = {
    if (debug)
      System.err.println(s"BGZF-GATE decodes=${activeDecodes.get} readers=${activeReaders.get} pool=$poolSize")
    if (activeDecodes.get + activeReaders.get >= poolSize) return null
    val fut = new java.util.concurrent.CompletableFuture[T]()
    activeDecodes.incrementAndGet()
    pool.execute { () =>
      try fut.complete(work())
      catch { case t: Throwable => fut.completeExceptionally(t) }
      finally activeDecodes.decrementAndGet()
    }
    fut
  }
}

/** Ordered BGZF block cursor shared by every block-loop stream: raw block
  * framing is read sequentially on the task thread (stream order is the
  * only ordering constraint), inflation rides [[BgzfPool]] when cores are
  * idle, and `next()` hands blocks back strictly in file order. When the
  * pool gate is closed the ring never grows past the one block being
  * served — the exact sequential read-inflate-parse loop this class
  * replaced.
  *
  * `stopAfter`: never read a block whose offset exceeds it (chunk streams
  * know their last block up front; prefetch must not overshoot a bounded
  * region read).
  */
private[sources] final class BgzfBlocks(raw: InputStream,
                                        firstOffset: Long = 0L,
                                        stopAfter: Long = Long.MaxValue) {
  import java.util.concurrent.Future

  /** One block in flight: offset + compressed size are known at read time
    * (the split/resync ownership decisions need them before inflation);
    * `data` joins the async inflate or inflates inline on the task-owned
    * Inflater. Single-use: each call re-inflates on the inline path.
    */
  final class Entry(val offset: Long, val compressedSize: Int,
                    rb: Bgzf.RawBlock, fut: Future[Array[Byte]]) {
    def data: Array[Byte] =
      if (fut == null) Bgzf.inflateRaw(rb, inf)
      else try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          e.getCause match {
            case re: RuntimeException => throw re
            case io: java.io.IOException => throw io
            case other => throw new RuntimeException(other)
          }
      }
  }

  private val inf = new Inflater(true)
  private val depth =
    sys.env.getOrElse("GRAFT_BGZF_DEPTH", "32").toInt
  private val group =
    math.max(1, sys.env.getOrElse("GRAFT_BGZF_GROUP", "4").toInt)
  private val ring = new java.util.ArrayDeque[Entry](depth)
  private var nextOffset = firstOffset
  private var rawEof = false
  // prefetch persists only while the pool keeps granting async slots: the
  // first gated (inline) batch parks the cursor in sequential mode until
  // the ring drains and the gate is re-probed. GRAFT_BGZF_ASYNC=0 is the
  // kill switch (pure sequential read-inflate-parse, the pre-pool path).
  private var asyncGranted =
    sys.env.getOrElse("GRAFT_BGZF_ASYNC", "1") != "0"
  private val asyncEnabled = asyncGranted
  if (BgzfPool.debug)
    System.err.println(s"BGZF-BLOCKS new first=$firstOffset stop=$stopAfter async=$asyncEnabled")
  BgzfPool.trackReader()

  private def fill(): Unit = {
    while (!rawEof && nextOffset <= stopAfter &&
        (ring.isEmpty || (asyncGranted && ring.size < depth))) {
      // read up to one group of raw blocks, then submit them as ONE pool
      // handoff (per-block handoff overhead measurably exceeds the overlap
      // win on parse-light formats)
      val want =
        if (asyncGranted) math.min(group, depth - math.max(ring.size, 0))
        else 1
      val rbs = new Array[Bgzf.RawBlock](want)
      val offs = new Array[Long](want)
      var k = 0
      while (k < want && !rawEof && nextOffset <= stopAfter) {
        val rb = Bgzf.readRawBlock(raw)
        if (rb == null) rawEof = true
        else {
          rbs(k) = rb; offs(k) = nextOffset
          nextOffset += rb.compressedSize
          k += 1
        }
      }
      if (k == 0) return
      val futs = if (asyncEnabled) BgzfPool.tryAsyncBatch(rbs, k) else null
      asyncGranted = futs != null
      var i = 0
      while (i < k) {
        ring.add(new Entry(offs(i), rbs(i).compressedSize, rbs(i),
          if (futs == null) null else futs(i)))
        i += 1
      }
    }
  }

  /** Next block in file order; null at EOF or past `stopAfter`. */
  def next(): Entry = { fill(); ring.poll() }

  def close(): Unit = inf.end()
}

/** Decompressed stream over an entire BGZF file: a sequential readBlock
  * loop serving bytes from each inflated block's array. Roughly 2x faster
  * than GZIPInputStream on whole-file BAM/BCF decode — no per-member CRC
  * recomputation, and byte-at-a-time record reads hit an array instead of
  * the inflater; block inflation overlaps parse via [[BgzfBlocks]] when
  * cores are idle.
  */
final class BgzfStreamInputStream(raw: InputStream) extends InputStream {
  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  private val blocks = new BgzfBlocks(raw)

  private def advance(): Unit = {
    while (!done && pos >= limit) {
      val b = blocks.next()
      if (b == null) { done = true; return }
      buf = b.data
      pos = 0
      limit = buf.length
    }
  }

  override def read(): Int = {
    advance()
    if (done) -1 else { val v = buf(pos) & 0xff; pos += 1; v }
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    advance()
    if (done) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(buf, pos, out, off, n)
    pos += n
    n
  }

  override def close(): Unit = { blocks.close(); raw.close() }
}

/** Decode/parse overlap for SEQUENTIAL decompressors (plain gzip, zstd,
  * bzip2, xz — codecs whose streams cannot be block-parallelised the way
  * BGZF can): a long-running producer on the shared idle-core pool pulls
  * decompressed bytes from `inner` into chunk buffers ahead of the
  * consumer, so the task thread spends its time parsing instead of
  * inflating. Upper bound is 2x (one producer, one consumer); the gain is
  * the inflate share of the profile. Takes ONE pool slot for the stream's
  * lifetime — the same global decode budget as BGZF block inflation, so
  * full-width scans see the gate closed and fall back to the plain
  * sequential read (`AsyncChunkedInputStream.wrap` returns `inner`
  * untouched). Producer failures surface on the consumer's next read.
  */
final class AsyncChunkedInputStream private (
    inner: InputStream,
    producerSlot: java.util.concurrent.CompletableFuture[Unit],
    q: java.util.concurrent.ArrayBlockingQueue[AnyRef],
    closed: java.util.concurrent.atomic.AtomicBoolean) extends InputStream {

  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  private var error: Throwable = _

  private def advance(): Unit = {
    while (!done && pos >= limit) {
      q.take() match {
        case AsyncChunkedInputStream.Eof =>
          done = true
        case t: Throwable =>
          done = true; error = t
        case a: Array[Byte] =>
          buf = a; pos = 0; limit = a.length
      }
    }
    if (error != null) {
      val e = error; error = null; done = true
      e match {
        case io: java.io.IOException => throw io
        case re: RuntimeException    => throw re
        case other                   => throw new java.io.IOException(other)
      }
    }
  }

  override def read(): Int = {
    advance()
    if (done) -1 else { val v = buf(pos) & 0xff; pos += 1; v }
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    advance()
    if (done) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(buf, pos, out, off, n)
    pos += n
    n
  }

  override def close(): Unit = {
    closed.set(true)
    q.clear() // unblock a producer parked on a full queue
    try producerSlot.get(5, java.util.concurrent.TimeUnit.SECONDS)
    catch { case _: Throwable => () }
    inner.close()
  }
}

object AsyncChunkedInputStream {
  private[sources] case object Eof
  private val ChunkBytes = 1 << 18
  private val Depth = 8

  /** Pipeline `inner` through the idle-core pool when a slot is free;
    * return `inner` unchanged when the gate is closed (full-width scans —
    * the overlap is a single-task/idle-core optimization by design).
    */
  def wrap(inner: InputStream): InputStream = {
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q = new java.util.concurrent.ArrayBlockingQueue[AnyRef](Depth)
    val slot = BgzfPool.tryAsyncWork { () =>
      try {
        var eof = false
        while (!eof && !closed.get) {
          val chunk = new Array[Byte](ChunkBytes)
          var got = 0
          while (got < ChunkBytes && !eof) {
            val n = inner.read(chunk, got, ChunkBytes - got)
            if (n < 0) eof = true else got += n
          }
          val out: AnyRef =
            if (got == ChunkBytes) chunk
            else java.util.Arrays.copyOf(chunk, got)
          if (got > 0) {
            // bounded offer so close() can always stop a parked producer
            while (!closed.get &&
              !q.offer(out, 100, java.util.concurrent.TimeUnit.MILLISECONDS)) ()
          }
        }
        while (!closed.get &&
          !q.offer(Eof, 100, java.util.concurrent.TimeUnit.MILLISECONDS)) ()
      } catch {
        case t: Throwable =>
          while (!closed.get &&
            !q.offer(t, 100, java.util.concurrent.TimeUnit.MILLISECONDS)) ()
      }
    }
    if (slot == null) inner
    else new AsyncChunkedInputStream(inner, slot, q, closed)
  }
}

/** InputStream over the BGZF-decompressed bytes of one virtual-position
  * chunk [vStart, vEnd]. Seeks the raw stream to the chunk's first block and
  * serves decompressed bytes until the end virtual position. Index chunk
  * boundaries are record-aligned, so line parsing terminates cleanly.
  */
/** Decompressed stream over one COMPRESSED-offset split [cStart, cEnd) of a
  * BGZF file with NO index: the index-free analog of the full-scan split,
  * for one-line-per-record text formats (bgzipped VCF/GFF/BED/... without a
  * .tbi sibling — the common landing-zone shape).
  *
  * Block ownership is positional and deterministic: the chunk owns every
  * block whose start offset is in [findBlockAtOrAfter(cStart),
  * first block >= cEnd). Record alignment is the Hadoop text convention
  * lifted to block granularity — this stream ALWAYS serves past the last
  * owned block through the first '\n' of the following blocks (so the line
  * straddling the boundary completes here), and the READER of a cStart>0
  * chunk always discards its first line (served by the predecessor's
  * tail). Every line lands in exactly one chunk under any chunking;
  * BgzfBlockSplitSpec asserts the invariance.
  */
final class BgzfBlockSplitInputStream(raw: FSDataInputStream, cStart: Long,
                                      cEnd: Long, fileSize: Long)
  extends InputStream {

  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  private var tailing = false
  private var lastTail = false
  private var blocks: BgzfBlocks = null
  private val startOffset: Long = Bgzf.findBlockAtOrAfter(raw, cStart, fileSize)

  if (startOffset < 0) done = true
  else {
    raw.seek(startOffset)
    blocks = new BgzfBlocks(raw, startOffset)
    advance()
  }

  private def advance(): Unit = {
    while (!done && pos >= limit) {
      if (lastTail) { done = true; return }
      val block = blocks.next()
      if (block == null) { done = true; return }
      if (!tailing && block.offset >= cEnd) tailing = true
      buf = block.data
      pos = 0
      limit = buf.length
      if (tailing) {
        // serve only through the first '\n' at/after the boundary; the
        // straddling line's remainder may span multiple blocks
        var i = 0
        var nl = -1
        while (i < limit && nl < 0) { if (buf(i) == '\n') nl = i; i += 1 }
        if (nl >= 0) { limit = nl + 1; lastTail = true }
      }
    }
  }

  override def read(): Int = {
    if (done) return -1
    val b = buf(pos) & 0xff
    pos += 1
    if (pos >= limit) advance()
    b
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    if (done) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(buf, pos, out, off, n)
    pos += n
    if (pos >= limit) advance()
    n
  }

  override def close(): Unit = {
    if (blocks != null) blocks.close()
    raw.close()
  }
}

/** Decompressed stream over one COMPRESSED-offset split [cStart, cEnd) of a
  * BGZF binary file with NO index (unindexed BAM/BCF — the landing-zone
  * shape before `samtools index` runs): the record-structured analog of
  * BgzfBlockSplitInputStream, for formats whose record boundary is not a
  * line but a self-describing binary header the FORMAT can re-find
  * (BAM/BCF record resync, the hadoop-bam SplitGuesser technique).
  *
  * Block ownership is positional and deterministic, same convention as the
  * text split: the chunk owns every block whose raw offset is in
  * [findBlockAtOrAfter(cStart), first block >= cEnd). Unlike the text
  * stream, this one never cuts: it serves decompressed bytes from the first
  * owned block through EOF, because a record starting in the last owned
  * block may straddle arbitrarily many following blocks. The FORMAT stops
  * instead, via `positionIsOwned`: a record belongs to this chunk iff its
  * first decompressed byte falls inside the owned blocks' extent. Every
  * record therefore lands in exactly one chunk under any chunking
  * (BamResyncSpec asserts the invariance).
  */
final class BgzfResyncInputStream(raw: FSDataInputStream, cStart: Long,
                                  cEnd: Long, fileSize: Long)
  extends InputStream {

  private val queue = new java.util.ArrayDeque[Array[Byte]]()
  private var headPos = 0 // read offset into the queue head
  private var blocks: BgzfBlocks = null
  private val firstOffset: Long =
    if (cStart == 0) 0L else Bgzf.findBlockAtOrAfter(raw, cStart, fileSize)
  private var eof = firstOffset < 0
  // decompressed bytes of OWNED blocks loaded so far; final once
  // `ownedComplete` (the last owned block has been loaded, known the moment
  // its successor's offset lands >= cEnd — no lookahead needed)
  private var ownedLoaded = 0L
  private var ownedComplete = eof
  private var served = 0L

  /** False when no block starts inside [cStart, cEnd) — the whole chunk is
    * interior to one block owned by the predecessor.
    */
  val hasOwned: Boolean = !eof && firstOffset < cEnd
  if (!eof) {
    raw.seek(firstOffset)
    blocks = new BgzfBlocks(raw, firstOffset)
  }
  if (!hasOwned) ownedComplete = true

  private def loadBlock(): Boolean = {
    if (eof) return false
    val block = blocks.next()
    if (block == null) { eof = true; ownedComplete = true; return false }
    val data = block.data
    if (block.offset < cEnd) ownedLoaded += data.length
    if (block.offset + block.compressedSize >= cEnd) ownedComplete = true
    if (data.length > 0) queue.addLast(data)
    true
  }

  /** True iff decompressed position `pos` (0 = first byte of the first
    * owned block) lies inside this chunk's owned extent. Loads ahead as
    * needed; never loads past the first non-owned block.
    */
  def positionIsOwned(pos: Long): Boolean = {
    while (!ownedComplete && pos >= ownedLoaded) loadBlock()
    pos < ownedLoaded
  }

  /** Decompressed bytes served through read() so far — equals the current
    * record-start position for a parser that consumes records back to back.
    */
  def servedPosition: Long = served

  override def read(): Int = {
    while (queue.isEmpty || headPos >= queue.peekFirst().length) {
      if (!queue.isEmpty) { queue.removeFirst(); headPos = 0 }
      else if (!loadBlock()) return -1
    }
    val b = queue.peekFirst()(headPos) & 0xff
    headPos += 1
    served += 1
    b
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    while (queue.isEmpty || headPos >= queue.peekFirst().length) {
      if (!queue.isEmpty) { queue.removeFirst(); headPos = 0 }
      else if (!loadBlock()) return -1
    }
    val head = queue.peekFirst()
    val n = math.min(len, head.length - headPos)
    System.arraycopy(head, headPos, out, off, n)
    headPos += n
    served += n
    n
  }

  override def close(): Unit = {
    if (blocks != null) blocks.close()
    raw.close()
  }
}

/** Unsynchronized concat of a byte-array prefix and a tail stream: the
  * resync scan buffers the chunk's first bytes hunting for a record start,
  * and the parser then consumes the remainder of that buffer before the
  * live stream. SequenceInputStream+ByteArrayInputStream would add two
  * synchronized virtual hops to every one of LEInput's millions of 1-4
  * byte reads — measurably (~1.6x) slower on the decode hot path.
  */
final class PrefixedInputStream(buf: Array[Byte], private var off: Int,
                                len: Int, tail: InputStream)
  extends InputStream {
  override def read(): Int =
    if (off < len) { val b = buf(off) & 0xff; off += 1; b } else tail.read()
  override def read(out: Array[Byte], o: Int, n: Int): Int =
    if (off < len) {
      val k = math.min(n, len - off)
      System.arraycopy(buf, off, out, o, k)
      off += k
      k
    } else tail.read(out, o, n)
  override def close(): Unit = tail.close()
}

/** Shared scan harness for index-free record resync (BAM/BCF): grows a
  * buffer over a resync chunk's decompressed bytes and returns the first
  * candidate offset the format's validator accepts AND the chunk owns.
  * The validator returns 1 valid / 0 invalid / -1 need-more-bytes.
  */
object ResyncScan {
  /** First owned record start: offset into `buf` (== decompressed position
    * from the chunk's first block), with the buffer and its filled length
    * so the caller can serve parsed records from it. Null when no record
    * starts inside the owned extent (chunk interior to one straddling
    * record) — a correct zero-row chunk.
    */
  final class Start(val offset: Int, val buf: Array[Byte], val len: Int,
                    val exhausted: Boolean)

  /** A record boundary exists within one max-record-length of the chunk
    * start (records are back to back), so the buffer is bounded by the max
    * record size the validators admit (2^28) plus chain slack — growth is
    * capped and overrun fails LOUDLY rather than risk silently dropping
    * records.
    */
  private val MaxBuf = 192 << 20

  def findFirst(rr: BgzfResyncInputStream,
                validate: (Array[Byte], Int, Int, Boolean) => Int,
                what: String): Start = {
    var buf = new Array[Byte](1 << 18)
    var n = 0
    var exhausted = false
    def fillTo(target: Int): Unit = {
      val t = math.min(target, MaxBuf)
      if (t > buf.length) {
        var cap = buf.length
        while (cap < t) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxBuf))
      }
      while (n < t && n < buf.length && !exhausted) {
        val r = rr.read(buf, n, buf.length - n)
        if (r < 0) exhausted = true else n += r
      }
    }
    fillTo(1 << 18)
    var c = 0
    while (rr.positionIsOwned(c)) {
      validate(buf, n, c, exhausted) match {
        case 1 => return new Start(c, buf, n, exhausted)
        case 0 => c += 1
        case _ =>
          if (n >= MaxBuf) throw new IllegalStateException(
            s"$what resync: no record boundary within $MaxBuf decompressed " +
              "bytes of chunk start — file corrupt or records larger than " +
              "the resync cap; index the file to scan it")
          fillTo(math.max(n + (1 << 18), n * 2))
      }
    }
    null
  }
}

final class BgzfChunkInputStream(raw: FSDataInputStream, vStart: Long, vEnd: Long)
  extends InputStream {

  private val endCoffset = vEnd >>> 16
  private val startCoffset = vStart >>> 16
  private var firstBlock = true
  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  // stopAfter bounds prefetch to the chunk's own blocks: a small indexed
  // region read must never inflate blocks past its end virtual position
  private val blocks = {
    raw.seek(startCoffset)
    new BgzfBlocks(raw, startCoffset, stopAfter = endCoffset)
  }

  advance()

  /** Load blocks until there is at least one servable byte or the chunk is
    * exhausted.
    */
  private def advance(): Unit = {
    while (!done) {
      val block = blocks.next()
      if (block == null) { done = true; return }
      buf = block.data
      pos = if (firstBlock) (vStart & 0xffff).toInt else 0
      firstBlock = false
      limit = if (block.offset == endCoffset)
                math.min(buf.length, (vEnd & 0xffff).toInt)
              else buf.length
      // after the end block the cursor returns null by itself (stopAfter),
      // so no explicit end-of-chunk bookkeeping is needed here
      if (pos < limit) return
    }
  }

  override def read(): Int = {
    if (done) return -1
    val b = buf(pos) & 0xff
    pos += 1
    if (pos >= limit) advance()
    b
  }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    if (done) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(buf, pos, out, off, n)
    pos += n
    if (pos >= limit) advance()
    n
  }

  override def close(): Unit = { blocks.close(); raw.close() }
}
