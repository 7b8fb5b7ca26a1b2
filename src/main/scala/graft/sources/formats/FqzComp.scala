package graft.sources.formats

/** fqzcomp quality decoder — CRAM 3.1 block method 7, hand-decoded from
  * the public CRAMcodecs specification (the codec samtools applies to
  * quality-score blocks at high compression levels; lineage: Bonfield's
  * fqzcomp via htscodecs). The reference reads CRAM via noodles
  * (exon/exon-cram); here the codec is implemented directly.
  *
  * The block's uncompressed form is the concatenated per-record quality
  * bytes; record lengths are carried inside the stream. Header: vers (5),
  * gflags (MULTI_PARAM=1, HAVE_STAB=2, DO_REV=4), optional parameter-set
  * count + selector table, then per parameter set: 16-bit initial
  * context, pflags (DEDUP=2, DO_LEN=4, DO_SEL=8, HAVE_QMAP=16,
  * HAVE_PTAB=32, HAVE_DTAB=64, HAVE_QTAB=128), max_sym, and packed
  * nibbles qbits/qshift, qloc/sloc, ploc/dloc, followed by the optional
  * qmap and run-length-serialised qtab/ptab/dtab arrays.
  *
  * Per record: optional selector (own model), 4-byte little-endian length
  * (own model per byte; fixed-length streams encode it once), optional
  * reverse flag, optional dedup flag (1 = copy the previous record's
  * bytes). Each quality symbol comes from one of 2^16 adaptive models
  * indexed by a context built per the spec:
  *   ctx = (qctx & (2^qbits-1)) << qloc  [qctx = (qctx << qshift) + qtab[q]]
  *       + ptab[min(pos_remaining,1023)] << ploc   (if HAVE_PTAB)
  *       + dtab[min(delta,255)] << dloc            (if HAVE_DTAB)
  *       + sel << sloc                             (if DO_SEL)
  * with delta counting q != prevq so far, starting from the parameter
  * set's initial context at each record boundary. The entropy layer is
  * the shared carryless range coder + adaptive models ([[RangeDecoder]]/
  * [[ByteModel]]). Array serialisation: literal value bytes, where a
  * value equal to the previous one is followed by a run byte of extra
  * repeats (255 chains).
  *
  * Known answers pinned by FqzSpec against streams from tools/fqzcomp.py,
  * an independent Python encoder written from the same public spec.
  */
object FqzComp {
  private val MULTI_PARAM = 1
  private val HAVE_STAB = 2
  private val DO_REV = 4

  private val PF_DEDUP = 2
  private val PF_DO_LEN = 4
  private val PF_DO_SEL = 8
  private val PF_HAVE_QMAP = 16
  private val PF_HAVE_PTAB = 32
  private val PF_HAVE_DTAB = 64
  private val PF_HAVE_QTAB = 128

  private final class In(val b: Array[Byte], var o: Int) {
    def u8(): Int = { val v = b(o) & 0xff; o += 1; v }
  }

  private final case class Param(context: Int, pflags: Int, maxSym: Int,
                                 qbits: Int, qshift: Int, qloc: Int, sloc: Int,
                                 ploc: Int, dloc: Int,
                                 qmap: Array[Int], qtab: Array[Int],
                                 ptab: Array[Int], dtab: Array[Int]) {
    def doDedup: Boolean = (pflags & PF_DEDUP) != 0
    def doLen: Boolean = (pflags & PF_DO_LEN) != 0
    def doSel: Boolean = (pflags & PF_DO_SEL) != 0
    def havePtab: Boolean = (pflags & PF_HAVE_PTAB) != 0
    def haveDtab: Boolean = (pflags & PF_HAVE_DTAB) != 0
  }

  /** Literal value bytes; a value equal to the previous one is followed
    * by a run byte of extra repeats, chaining while the run byte is 255.
    */
  private def readArray(src: In, size: Int): Array[Int] = {
    val out = new Array[Int](size)
    var j = 0
    var last = -1
    while (j < size) {
      val v = src.u8()
      out(j) = v
      j += 1
      if (v == last) {
        var r = src.u8()
        var extra = r
        while (r == 255) { r = src.u8(); extra += r }
        var k = 0
        while (k < extra && j < size) { out(j) = v; j += 1; k += 1 }
        last = -1
      } else last = v
    }
    out
  }

  private def readParam(src: In): Param = {
    val context = src.u8() | (src.u8() << 8)
    val pflags = src.u8()
    val maxSym = src.u8()
    var x = src.u8()
    val qbits = x >> 4; val qshift = x & 15
    x = src.u8()
    val qloc = x >> 4; val sloc = x & 15
    x = src.u8()
    val ploc = x >> 4; val dloc = x & 15
    val qmap =
      if ((pflags & PF_HAVE_QMAP) != 0) Array.fill(maxSym)(src.u8())
      else null
    val qtab =
      if ((pflags & PF_HAVE_QTAB) != 0) readArray(src, 256)
      else Array.tabulate(256)(identity)
    val ptab = if ((pflags & PF_HAVE_PTAB) != 0) readArray(src, 1024) else null
    val dtab = if ((pflags & PF_HAVE_DTAB) != 0) readArray(src, 256) else null
    Param(context, pflags, maxSym, qbits, qshift, qloc, sloc, ploc, dloc,
      qmap, qtab, ptab, dtab)
  }

  def decode(payload: Array[Byte], knownLen: Int): Array[Byte] = {
    require(knownLen >= 0, "cram: fqzcomp needs the block's raw size")
    val src = new In(payload, 0)
    val vers = src.u8()
    require(vers == 5, s"cram: fqzcomp version $vers (want 5)")
    val gflags = src.u8()
    val nparam = if ((gflags & MULTI_PARAM) != 0) src.u8() else 1
    var maxSel = if (nparam > 1) nparam - 1 else 0
    val stab =
      if ((gflags & HAVE_STAB) != 0) {
        maxSel = src.u8()
        readArray(src, 256)
      } else Array.tabulate(256)(i => math.min(i, nparam - 1))
    val params = Array.fill(nparam)(readParam(src))

    val rc = new RangeDecoder(() => src.u8())
    // 2^16 quality contexts, allocated lazily: real blocks touch a small
    // fraction, and each model is O(max_sym)
    val maxSymAll = params.map(_.maxSym).max
    val qualModels = new Array[ByteModel](1 << 16)
    def qual(ctx: Int): ByteModel = {
      var m = qualModels(ctx)
      if (m == null) { m = new ByteModel(maxSymAll); qualModels(ctx) = m }
      m
    }
    val lenModels = Array.fill(4)(new ByteModel(256))
    val selModel = new ByteModel(maxSel + 1)
    val revModel = new ByteModel(2)
    val dupModel = new ByteModel(2)

    val out = new Array[Byte](knownLen)
    val revRanges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    var i = 0
    var p: Param = null
    var rem = 0          // bytes remaining in the current record
    var recLen = 0
    var lastLen = -1
    var sel = 0
    var qctx = 0
    var prevq = 0
    var delta = 0
    var ctx = 0
    var first = true

    while (i < knownLen) {
      if (rem == 0) {
        // record boundary
        sel = if (maxSel > 0) selModel.decode(rc) else 0
        p = params(stab(sel))
        recLen =
          if (first || p.doLen) {
            val l = lenModels(0).decode(rc) | (lenModels(1).decode(rc) << 8) |
              (lenModels(2).decode(rc) << 16) | (lenModels(3).decode(rc) << 24)
            lastLen = l
            l
          } else lastLen
        first = false
        require(recLen > 0 && i + recLen <= knownLen,
          s"cram: fqzcomp record length $recLen at $i overruns $knownLen")
        if ((gflags & DO_REV) != 0 && revModel.decode(rc) == 1)
          revRanges += ((i, recLen))
        if (p.doDedup && dupModel.decode(rc) == 1) {
          // duplicate of the previous record's bytes
          require(i >= recLen,
            s"cram: fqzcomp dedup at $i needs a previous $recLen-byte record")
          System.arraycopy(out, i - recLen, out, i, recLen)
          i += recLen
          rem = 0
        } else {
          rem = recLen
          qctx = 0; prevq = 0; delta = 0
          ctx = p.context
        }
      }
      if (rem > 0) {
        val q = qual(ctx).decode(rc)
        out(i) = (if (p.qmap != null) p.qmap(q) else q).toByte
        // next context, per the spec's update rule
        qctx = (qctx << p.qshift) + p.qtab(q)
        // position counts the just-decoded symbol (the decrement happens
        // after the context update, matching the spec's update order)
        var c = (qctx & ((1 << p.qbits) - 1)) << p.qloc
        if (p.havePtab) c += p.ptab(math.min(rem, 1023)) << p.ploc
        if (p.haveDtab) c += p.dtab(math.min(delta, 255)) << p.dloc
        if (p.doSel) c += sel << p.sloc
        ctx = c & 0xffff
        if (prevq != q) delta += 1
        prevq = q
        i += 1
        rem -= 1
      }
    }
    revRanges.foreach { case (start, len) =>
      var a = start; var b = start + len - 1
      while (a < b) {
        val t = out(a); out(a) = out(b); out(b) = t
        a += 1; b -= 1
      }
    }
    out
  }
}
