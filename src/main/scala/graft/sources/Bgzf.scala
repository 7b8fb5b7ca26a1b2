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

  /** Read and inflate one BGZF block at the stream's current position.
    * Returns null at clean EOF. Allocates a fresh Inflater — block-loop
    * callers should use the reusing overload (JNI inflater init per 18 KB
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
    val isize = u32(tail, 4).toInt
    val out = new Array[Byte](isize)
    if (isize > 0) {
      inf.reset()
      inf.setInput(cdata)
      var off = 0
      while (off < isize && !inf.finished()) {
        val n = inf.inflate(out, off, isize - off)
        if (n == 0 && inf.needsInput())
          throw new java.io.EOFException("corrupt BGZF block: inflater stalled")
        off += n
      }
    }
    Block(out, bsize)
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

/** Decompressed stream over an entire BGZF file: a sequential readBlock
  * loop serving bytes from each inflated block's array. Roughly 2x faster
  * than GZIPInputStream on whole-file BAM/BCF decode — no per-member CRC
  * recomputation, and byte-at-a-time record reads hit an array instead of
  * the inflater.
  */
final class BgzfStreamInputStream(raw: InputStream) extends InputStream {
  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  private val inf = new Inflater(true) // reused across blocks

  private def advance(): Unit = {
    while (!done && pos >= limit) {
      val b = Bgzf.readBlock(raw, inf)
      if (b == null) { done = true; return }
      buf = b.data
      pos = 0
      limit = b.data.length
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

  override def close(): Unit = { inf.end(); raw.close() }
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
  private val inf = new Inflater(true) // reused across blocks
  private var nextBlockOffset: Long =
    Bgzf.findBlockAtOrAfter(raw, cStart, fileSize)

  if (nextBlockOffset < 0) done = true
  else { raw.seek(nextBlockOffset); advance() }

  private def advance(): Unit = {
    while (!done && pos >= limit) {
      if (lastTail) { done = true; return }
      if (!tailing && nextBlockOffset >= cEnd) tailing = true
      val cur = nextBlockOffset
      val block = Bgzf.readBlock(raw, inf)
      if (block == null) { done = true; return }
      nextBlockOffset = cur + block.compressedSize
      buf = block.data
      pos = 0
      limit = block.data.length
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

  override def close(): Unit = { inf.end(); raw.close() }
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
  private val inf = new Inflater(true) // reused across blocks
  private var nextBlockOffset: Long =
    if (cStart == 0) 0L else Bgzf.findBlockAtOrAfter(raw, cStart, fileSize)
  private var eof = nextBlockOffset < 0
  // decompressed bytes of OWNED blocks loaded so far; final once
  // `ownedComplete` (the last owned block has been loaded, known the moment
  // its successor's offset lands >= cEnd — no lookahead needed)
  private var ownedLoaded = 0L
  private var ownedComplete = eof
  private var served = 0L

  /** False when no block starts inside [cStart, cEnd) — the whole chunk is
    * interior to one block owned by the predecessor.
    */
  val hasOwned: Boolean = !eof && nextBlockOffset < cEnd
  if (!eof) raw.seek(nextBlockOffset)
  if (!hasOwned) ownedComplete = true

  private def loadBlock(): Boolean = {
    if (eof) return false
    val cur = nextBlockOffset
    val block = Bgzf.readBlock(raw, inf)
    if (block == null) { eof = true; ownedComplete = true; return false }
    nextBlockOffset = cur + block.compressedSize
    if (cur < cEnd) ownedLoaded += block.data.length
    if (nextBlockOffset >= cEnd) ownedComplete = true
    if (block.data.length > 0) queue.addLast(block.data)
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

  override def close(): Unit = { inf.end(); raw.close() }
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
  private var nextBlockOffset: Long = vStart >>> 16
  private var firstBlock = true
  private var buf: Array[Byte] = _
  private var pos = 0
  private var limit = 0
  private var done = false
  private val inf = new Inflater(true) // reused across blocks

  raw.seek(nextBlockOffset)
  advance()

  /** Load blocks until there is at least one servable byte or the chunk is
    * exhausted.
    */
  private def advance(): Unit = {
    while (!done) {
      if (nextBlockOffset > endCoffset) { done = true; return }
      val cur = nextBlockOffset
      val block = Bgzf.readBlock(raw, inf)
      if (block == null) { done = true; return }
      nextBlockOffset = cur + block.compressedSize
      buf = block.data
      pos = if (firstBlock) (vStart & 0xffff).toInt else 0
      firstBlock = false
      limit = if (cur == endCoffset) math.min(buf.length, (vEnd & 0xffff).toInt)
              else buf.length
      if (pos < limit) return
      if (cur == endCoffset) { done = true; return }
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

  override def close(): Unit = { inf.end(); raw.close() }
}
