package graft.sources.formats

import java.io.{DataInputStream, EOFException, InputStream}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** BAM reader: binary alignment records inside BGZF, hand-decoded from the
  * public SAM/BAM spec (§4.2). Output schema and value semantics match the
  * SAM text reader (same golden row as sam-select-tests.slt; 1-based start,
  * CIGAR-derived end, raw Phred quality list, 255 mapq -> null).
  *
  * Unindexed scans stream the whole file; indexed scans get BGZF chunks from
  * the sibling .bai (see BaiIndex) and re-read only the header for the
  * reference-name table.
  */
object BamFormat extends GraftFormat {
  // executor-level header cache for BGZF-chunk reads, keyed by file path
  // (headers are tiny; entries live for the executor's lifetime)
  private val headerCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  override def shortName: String = "bam"
  override def defaultExtensions: Seq[String] = Seq("bam")
  override val dataSchema: StructType = SamFormat.dataSchema
  override def regionColumns: Option[(String, String, String)] =
    Some(("reference", "start", "end"))

  private val SeqCode = "=ACMGRSVTWYHKDBN"
  // byte table for the 4-bit base decode: the hot loop writes ASCII bytes
  // straight into the output array (a StringBuilder + String + UTF-8
  // re-encode per read was ~18% of the BAM decode profile)
  private val SeqCodeBytes = SeqCode.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val CigarOps = "MIDNSHP=X"

  private final class LEInput(in: InputStream) {
    private val d = new DataInputStream(in)
    def u8(): Int = d.readUnsignedByte()
    def u16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def i32(): Int = { val a = u16(); val b = u16(); a | (b << 16) }
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); d.readFully(b); b }
    def skip(n: Int): Unit = { var left = n; while (left > 0) { left -= d.skipBytes(left) } }
    /** i32 that signals EOF cleanly instead of throwing mid-field. */
    def i32OrEof(): Option[Int] = {
      val first = in.read()
      if (first < 0) return None
      Some(first | (u8() << 8) | (u8() << 16) | (u8() << 24))
    }
  }

  /** Reference names from a BAM header stream (positioned at magic). */
  def readHeaderRefs(decompressed: InputStream): Array[String] = {
    val in = new LEInput(decompressed)
    val magic = in.bytes(4)
    require(magic(0) == 'B' && magic(1) == 'A' && magic(2) == 'M', "not a BAM file")
    val lText = in.i32()
    in.skip(lText)
    val nRef = in.i32()
    Array.fill(nRef) {
      val lName = in.i32()
      val name = new String(in.bytes(lName), 0, lName - 1,
        java.nio.charset.StandardCharsets.US_ASCII) // strip trailing NUL
      in.i32() // l_ref
      name
    }
  }

  override def bgzfRecordResync: Boolean = true

  @inline private def bI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
  @inline private def bU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Validate a candidate record start at `b(c)`: walk the chain of
    * block_size-linked record headers, checking each against the BAM spec's
    * hard invariants (refID/next_refID within the header's reference count,
    * positions >= -1, read name present and NUL-terminated, block_size no
    * smaller than the fixed fields it must contain). Two chained valid
    * headers make a payload false positive astronomically unlikely — the
    * same technique (and largely the same checks) as hadoop-bam's
    * BAMSplitGuesser. Returns 1 valid, 0 invalid, -1 need more buffered
    * bytes to decide.
    */
  private[sources] def validateChain(b: Array[Byte], n: Int, c: Int,
                                     nRef: Int, exhausted: Boolean): Int = {
    var p = c.toLong
    var k = 0
    while (true) {
      if (p + 36 > n)
        return if (!exhausted) -1 else if (k >= 1 && p == n) 1 else 0
      val pi = p.toInt
      val bs = bI32(b, pi)
      if (bs < 34 || bs > (1 << 28)) return 0
      val refId = bI32(b, pi + 4)
      if (refId < -1 || refId >= nRef) return 0
      if (bI32(b, pi + 8) < -1) return 0
      val lrn = b(pi + 12) & 0xff
      if (lrn < 1) return 0
      val ncig = bU16(b, pi + 16)
      val lseq = bI32(b, pi + 20)
      if (lseq < 0) return 0
      val nrid = bI32(b, pi + 24)
      if (nrid < -1 || nrid >= nRef) return 0
      if (bI32(b, pi + 28) < -1) return 0
      if (bs < 32L + lrn + 4L * ncig + (lseq + 1L) / 2 + lseq) return 0
      if (p + 36 + lrn > n) return if (exhausted) 0 else -1
      if (b(pi + 36 + lrn - 1) != 0) return 0
      var q = pi + 36
      while (q < pi + 36 + lrn - 1) { if (b(q) == 0) return 0; q += 1 }
      k += 1
      if (k >= 2) return 1
      p += 4L + bs
      if (p > n) return if (exhausted) 0 else -1
    }
    1 // unreachable
  }

  /** Records of one index-free resync chunk: find the first record whose
    * start byte this chunk owns (validated chain scan over a growing
    * buffer), then parse records until the first start beyond the owned
    * extent. A chunk interior to one straddling record correctly yields
    * zero rows. See BgzfResyncInputStream for the ownership convention.
    */
  private def resyncRecords(input: RecordInput,
                            required: Array[Int]): Iterator[Array[Any]] = {
    val rr = input.resync
    if (!rr.hasOwned) return Iterator.empty
    if (input.startsAtFileStart) {
      // head chunk: in-stream header, records follow at an exact position.
      // servedPosition is read BEFORE interposing the buffer; after that,
      // record starts are tracked arithmetically (pos += 4 + block_size),
      // so buffered read-ahead cannot skew the ownership check.
      val refs = readHeaderRefs(rr)
      val start = rr.servedPosition
      // LEInput reads straight off the block queue (same as the whole-file
      // path) — interposing a BufferedInputStream costs ~1.6x on decode
      return ownedRecords(rr, new LEInput(rr), start, refs, required)
    }
    val refs =
      if (input.path != null)
        headerCache.computeIfAbsent(input.path.toString, _ => {
          val hs = new MultiMemberGzipInputStream(input.reopenRaw())
          try readHeaderRefs(hs) finally hs.close()
        })
      else {
        val hs = new MultiMemberGzipInputStream(input.reopenRaw())
        try readHeaderRefs(hs) finally hs.close()
      }
    val nRef = refs.length
    val s0 = ResyncScan.findFirst(rr,
      (b, n, c, ex) => validateChain(b, n, c, nRef, ex), "bam")
    if (s0 == null) return Iterator.empty
    // unsynchronized prefix-then-stream concat on the decode hot path;
    // ownership is checked on arithmetic record-start positions, so
    // buffered lookahead in s0.buf cannot skew it
    ownedRecords(rr,
      new LEInput(new PrefixedInputStream(s0.buf, s0.offset, s0.len, rr)),
      s0.offset, refs, required)
  }

  /** Parse records back to back from `in`, stopping before the first record
    * whose start position is beyond the chunk's owned extent.
    */
  private def ownedRecords(rr: graft.sources.BgzfResyncInputStream, in: LEInput,
                           startPos: Long, refs: Array[String],
                           required: Array[Int]): Iterator[Array[Any]] =
    new Iterator[Array[Any]] {
      private var pos = startPos
      private var nextRec: Array[Any] = _
      advance()

      private def advance(): Unit = {
        nextRec = null
        if (!rr.positionIsOwned(pos)) return
        in.i32OrEof().foreach { sz =>
          nextRec = parseRecord(in, sz, refs, required)
          pos += 4L + sz
        }
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Any] = { val r = nextRec; advance(); r }
    }

  override def records(input: RecordInput, schema: StructType,
                       required: Array[Int]): Iterator[Array[Any]] = {
    if (input.resync != null) return resyncRecords(input, required)
    val (stream, refs) =
      if (input.isBgzfChunk && input.startsAtFileStart) {
        // head chunk of a full-scan split: the chunk stream already
        // decompresses from byte 0, so the header (and its ref table) is
        // read in-stream and records follow directly.
        (input.stream, readHeaderRefs(input.stream))
      } else if (input.isBgzfChunk) {
        // chunk starts at a record; reference names come from the header.
        // Cached per path on the executor — a region query mapping one BAM
        // to N chunks would otherwise re-decompress the header N times.
        def readHdr(): Array[String] = {
          val headerStream = new MultiMemberGzipInputStream(input.reopenRaw())
          try readHeaderRefs(headerStream) finally headerStream.close()
        }
        val r =
          if (input.path != null)
            headerCache.computeIfAbsent(input.path.toString, _ => readHdr())
          else readHdr()
        (input.stream, r)
      } else {
        // Whole-file path. LEInput issues many 1-4 byte reads; against a
        // bare GZIPInputStream every one is a JNI inflate call (~175k
        // rec/s/core). Real BAMs are BGZF by spec, so decode via the block
        // reader (serves from the inflated block array, no per-member CRC
        // recompute — ~1.7M rec/s/core, same engine as the chunk path);
        // a non-BGZF gzip stream falls back to buffered GZIPInputStream.
        val buffered = new java.io.BufferedInputStream(input.stream, 1 << 16)
        val s: InputStream =
          if (Bgzf.looksLikeBgzf(buffered)) new BgzfStreamInputStream(buffered)
          else new java.io.BufferedInputStream(
            new MultiMemberGzipInputStream(buffered), 1 << 16)
        val r = readHeaderRefs(s)
        (s, r)
      }
    val in = new LEInput(stream)

    new Iterator[Array[Any]] {
      private var nextRec: Array[Any] = _
      advance()

      private def advance(): Unit = {
        nextRec = null
        // i32OrEof returns None ONLY when the stream ends cleanly before the
        // first length byte; a BAM truncated mid-record throws EOFException
        // and fails the task instead of silently yielding fewer rows.
        in.i32OrEof().foreach { sz => nextRec = parseRecord(in, sz, refs, required) }
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Any] = { val r = nextRec; advance(); r }
    }
  }

  private def parseRecord(in: LEInput, blockSize: Int, refs: Array[String],
                          required: Array[Int]): Array[Any] = {
    val refId = in.i32()
    val pos0 = in.i32()
    val lReadName = in.u8()
    val mapq = in.u8()
    in.u16() // bin
    val nCigar = in.u16()
    val flag = in.u16()
    val lSeq = in.i32()
    val nextRefId = in.i32()
    in.i32() // next_pos
    in.i32() // tlen
    val nameBytes = in.bytes(lReadName)
    val cigarOps = Array.fill(nCigar)(in.i32())
    val seqBytes = in.bytes((lSeq + 1) / 2)
    val qualBytes = in.bytes(lSeq)
    val tagLen = blockSize - 32 - lReadName - 4 * nCigar - (lSeq + 1) / 2 - lSeq
    val tagBytes = in.bytes(tagLen)

    def cigarString: String = {
      if (nCigar == 0) return null
      val sb = new java.lang.StringBuilder()
      cigarOps.foreach { op => sb.append(op >>> 4).append(CigarOps.charAt(op & 0xf)) }
      sb.toString
    }
    def refLen: Long = cigarOps.iterator.map { op =>
      (op & 0xf) match {
        case 0 | 2 | 3 | 7 | 8 => (op >>> 4).toLong // M D N = X
        case _ => 0L
      }
    }.sum
    val unmapped = refId < 0 || pos0 < 0 || nCigar == 0

    // while + @switch: required.map's Function1 dispatch is a measured
    // per-record tax (see the r17 VCF parse notes)
    val row = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      row(k) = (required(k): @scala.annotation.switch) match {
        case 0 =>
          // missing name: empty or the "*" placeholder (bytes incl. the NUL)
          if (lReadName <= 1 || (lReadName == 2 && nameBytes(0) == '*')) null
          else UTF8String.fromBytes(nameBytes, 0, lReadName - 1)
        case 1 => flag
        case 2 => if (refId < 0) null else utf8(refs(refId))
        case 3 => if (refId < 0 || pos0 < 0) null else (pos0 + 1).toLong
        case 4 => if (unmapped) null else pos0 + refLen
        case 5 => if (mapq == 255) null else utf8(mapq.toString)
        case 6 => if (nCigar == 0) null else utf8(cigarString)
        case 7 =>
          if (nextRefId < 0) null else utf8(refs(nextRefId))
        case 8 =>
          if (lSeq == 0) null
          else {
            val out = new Array[Byte](lSeq)
            var i = 0
            while (i < lSeq) {
              val b = seqBytes(i / 2) & 0xff
              out(i) = SeqCodeBytes(if (i % 2 == 0) b >>> 4 else b & 0xf)
              i += 1
            }
            UTF8String.fromBytes(out)
          }
        case 9 =>
          if (lSeq == 0 || (qualBytes.nonEmpty && (qualBytes(0) & 0xff) == 0xff)) null
          else {
            // primitive long array, no per-value boxing (100 boxed Longs per
            // read showed up as Arrays.copyOf churn in the decode profile)
            val arr = new Array[Long](lSeq)
            var i = 0
            while (i < lSeq) { arr(i) = qualBytes(i) & 0xff; i += 1 }
            org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray(arr)
          }
        case 10 => parseTags(tagBytes)
      }
      k += 1
    }
    row
  }

  /** Binary tags -> ARRAY<STRUCT<tag, value-as-string>> (same surface as the
    * SAM text reader's unparsed-tags mode).
    */
  private def parseTags(bytes: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def readString(): String = {
      val sb = new java.lang.StringBuilder()
      var c = bb.get()
      while (c != 0) { sb.append(c.toChar); c = bb.get() }
      sb.toString
    }
    while (bb.remaining() >= 4) {
      val tag = "" + bb.get().toChar + bb.get().toChar
      val typ = bb.get().toChar
      val value: String = typ match {
        case 'A' => bb.get().toChar.toString
        case 'c' => bb.get().toString
        case 'C' => (bb.get() & 0xff).toString
        case 's' => bb.getShort().toString
        case 'S' => (bb.getShort() & 0xffff).toString
        case 'i' => bb.getInt().toString
        case 'I' => (bb.getInt() & 0xffffffffL).toString
        case 'f' => floatStr(bb.getFloat())
        case 'Z' => readString()
        case 'H' => readString()
        case 'B' =>
          val elem = bb.get().toChar
          val n = bb.getInt()
          val vals = (0 until n).map { _ =>
            elem match {
              case 'c' => bb.get().toString
              case 'C' => (bb.get() & 0xff).toString
              case 's' => bb.getShort().toString
              case 'S' => (bb.getShort() & 0xffff).toString
              case 'i' => bb.getInt().toString
              case 'I' => (bb.getInt() & 0xffffffffL).toString
              case 'f' => floatStr(bb.getFloat())
            }
          }
          vals.mkString(",")
        case _ => return new GenericArrayData(out.toArray) // unknown: stop
      }
      out += new GenericInternalRow(Array[Any](utf8(tag), utf8(value)))
    }
    new GenericArrayData(out.toArray)
  }

  private def floatStr(f: Float): String = {
    if (f == f.toLong.toFloat && math.abs(f) < 1e15f) {
      val l = f.toLong
      if (l.toFloat == f) return l.toString
    }
    f.toString
  }
}
