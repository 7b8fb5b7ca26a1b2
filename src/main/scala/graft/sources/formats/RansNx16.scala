package graft.sources.formats

/** rANS Nx16 decoder — the entropy codec CRAM 3.1 adds over 3.0 (block
  * method 5), hand-decoded from the public CRAMcodecs specification
  * (samtools/hts-specs). The reference reads 3.1 via noodles-cram
  * (exon/exon-cram); here the codec is implemented directly.
  *
  * Stream = flags byte, then (unless NOSZ) the uncompressed length as a
  * big-endian base-128 uint7. Transforms compose: STRIPE transposes into
  * N self-describing sub-streams; PACK bit-packs (<=16 distinct symbols);
  * RLE run-length-encodes (run lengths live in a side meta stream that may
  * itself be order-0 rANS compressed); the entropy stage is CAT (raw),
  * order-0 (round-robin over N=4/32 states), or order-1 (context =
  * previous byte, each state owns a contiguous 1/N chunk, state N-1 takes
  * the tail). States renormalise 16 bits at a time against a 2^15 lower
  * bound; order-0 frequencies normalise to 2^12, order-1 rows to 2^shift
  * where shift is the high nibble of the table's lead byte (low bit set =
  * the table itself is order-0 compressed). Decode order of interleaved
  * states (position ascending, state index ascending, renormalising
  * immediately) fixes the shared byte-stream read order.
  *
  * Known answers for every flag combination are pinned by RansNx16Spec
  * against streams from tools/ransnx16.py, an independent Python encoder
  * written from the same public spec.
  */
object RansNx16 {
  private val RANS_L = 1L << 15
  private val ORDER1 = 1
  private val X32 = 4
  private val STRIPE = 8
  private val NOSZ = 16
  private val CAT = 32
  private val RLE = 64
  private val PACK = 128

  private final class In(val b: Array[Byte], var o: Int) {
    def u8(): Int = { val v = b(o) & 0xff; o += 1; v }
    def u16le(): Int = { val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8); o += 2; v }
    def u32le(): Long = {
      val v = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      o += 4; v
    }
    def u7(): Int = {
      // Cap at 5 bytes / non-negative: a corrupt stream must fail with the
      // codec's loud `cram:` error, not a NegativeArraySizeException later.
      var v = 0
      var c = 0
      var nb = 0
      do {
        c = u8(); v = (v << 7) | (c & 0x7f); nb += 1
        if (nb > 5 || v < 0)
          throw new IllegalStateException("cram: rANS Nx16 uint7 overflows 31 bits")
      } while ((c & 0x80) != 0)
      v
    }
    def read(n: Int): Array[Byte] = {
      require(n >= 0 && o + n <= b.length && o + n >= 0,
        s"cram: rANS Nx16 stream truncated (want $n bytes at $o of ${b.length})")
      val v = java.util.Arrays.copyOfRange(b, o, o + n); o += n; v
    }
  }

  /** Decode one Nx16 stream. `knownLen` is the block header's raw size,
    * used when the stream carries the NOSZ flag; pass -1 if unknown.
    */
  def decode(payload: Array[Byte], knownLen: Int): Array[Byte] =
    decode(new In(payload, 0), knownLen)

  private def decode(src: In, knownLen: Int): Array[Byte] = {
    val flags = src.u8()
    val nOut =
      if ((flags & NOSZ) != 0) {
        require(knownLen >= 0, "cram: rANS Nx16 NOSZ stream needs an external size")
        knownLen
      } else src.u7()
    val n = if ((flags & X32) != 0) 32 else 4

    if ((flags & STRIPE) != 0) return decodeStripe(src, nOut)

    var outLen = nOut // length produced by the entropy stage
    // PACK meta comes first in the stream; its expansion runs last.
    var packSyms: Array[Byte] = null
    var packFinal = 0
    if ((flags & PACK) != 0) {
      val nsym = src.u8()
      packSyms = src.read(nsym)
      packFinal = outLen
      outLen = src.u7() // packed length
    }
    // RLE meta second; its expansion runs before unpacking.
    var rleMeta: In = null
    var rleFinal = 0
    if ((flags & RLE) != 0) {
      val rm = src.u7()
      rleFinal = outLen
      outLen = src.u7() // literal length
      rleMeta =
        if ((rm & 1) != 0) new In(src.read(rm >> 1), 0)
        else {
          val c = src.u7()
          new In(rans0Decode(new In(src.read(c), 0), rm >> 1, 4, 12), 0)
        }
    }

    var data =
      if ((flags & CAT) != 0) src.read(outLen)
      else if ((flags & ORDER1) != 0) rans1Decode(src, outLen, n)
      else rans0Decode(src, outLen, n, 12)

    if (rleMeta != null) data = rleDecode(rleMeta, data, rleFinal)
    if (packSyms != null) data = packDecode(packSyms, data, packFinal)
    data
  }

  private def decodeStripe(src: In, nOut: Int): Array[Byte] = {
    val n = src.u8()
    val clens = Array.fill(n)(src.u7())
    val parts = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      val ulen = nOut / n + (if (nOut % n > j) 1 else 0)
      parts(j) = decode(new In(src.read(clens(j)), 0), ulen)
      j += 1
    }
    val out = new Array[Byte](nOut)
    var i = 0
    while (i < nOut) { out(i) = parts(i % n)(i / n); i += 1 }
    out
  }

  /** Ascending symbol list with +1-run shorthand: a symbol equal to
    * previous+1 is followed by a byte counting further consecutive
    * symbols; a 0 symbol terminates.
    */
  private def readAlphabet(src: In): Array[Int] = {
    val a = scala.collection.mutable.ArrayBuffer[Int]()
    var rle = 0
    var sym = src.u8()
    var last = sym
    var done = false
    while (!done) {
      a += sym
      if (rle > 0) { rle -= 1; sym += 1 }
      else {
        sym = src.u8()
        if (sym == last + 1) rle = src.u8()
      }
      last = sym
      if (sym == 0) done = true
    }
    a.toArray
  }

  /** Scale to sum exactly 2^bits, keeping nonzero entries nonzero; the
    * largest entry absorbs the residue. Encoder and decoder run the same
    * procedure, so already-normalised tables pass through unchanged.
    */
  private def normalise(f: Array[Int], bits: Int): Unit = {
    val tot = 1 << bits
    var t = 0L
    var mx = 0
    var mi = 0
    var i = 0
    while (i < 256) {
      t += f(i)
      if (f(i) > mx) { mx = f(i); mi = i }
      i += 1
    }
    if (t == 0 || t == tot) return
    var acc = 0
    i = 0
    while (i < 256) {
      if (f(i) > 0) {
        f(i) = math.max(1, (f(i).toLong * tot / t).toInt)
        acc += f(i)
      }
      i += 1
    }
    f(mi) += tot - acc
    require(f(mi) > 0, "cram: rANS Nx16 frequency normalisation underflow")
  }

  private def rans0Decode(src: In, nOut: Int, n: Int, bits: Int): Array[Byte] = {
    if (nOut == 0) return Array.emptyByteArray
    val alpha = readAlphabet(src)
    val f = new Array[Int](256)
    alpha.foreach(s => f(s) = src.u7())
    normalise(f, bits)
    val cum = new Array[Int](257)
    var s = 0
    while (s < 256) { cum(s + 1) = cum(s) + f(s); s += 1 }
    val lut = new Array[Byte](1 << bits)
    alpha.foreach { s =>
      var x = cum(s)
      while (x < cum(s + 1)) { lut(x) = s.toByte; x += 1 }
    }
    val mask = (1 << bits) - 1
    val states = Array.fill(n)(src.u32le())
    val out = new Array[Byte](nOut)
    var i = 0
    while (i < nOut) {
      val j = i % n
      var st = states(j)
      val slot = (st & mask).toInt
      val sym = lut(slot) & 0xff
      out(i) = sym.toByte
      st = f(sym) * (st >>> bits) + slot - cum(sym)
      if (st < RANS_L) st = (st << 16) | src.u16le()
      states(j) = st
      i += 1
    }
    out
  }

  private def rans1Decode(src0: In, nOut: Int, n: Int): Array[Byte] = {
    if (nOut == 0) return Array.emptyByteArray
    val comp = src0.u8()
    val shift = comp >> 4
    val src =
      if ((comp & 1) != 0) {
        val uLen = src0.u7()
        val cLen = src0.u7()
        new In(rans0Decode(new In(src0.read(cLen), 0), uLen, 4, 12), 0)
      } else src0
    val alpha = readAlphabet(src)
    val f = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    val lut = new Array[Array[Byte]](256)
    alpha.foreach { i =>
      val row = new Array[Int](256)
      f(i) = row
      var run = 0
      alpha.foreach { j =>
        if (run > 0) run -= 1
        else {
          row(j) = src.u7()
          if (row(j) == 0) run = src.u8()
        }
      }
      normalise(row, shift)
      val c = new Array[Int](257)
      var s = 0
      while (s < 256) { c(s + 1) = c(s) + row(s); s += 1 }
      cum(i) = c
      val l = new Array[Byte](1 << shift)
      alpha.foreach { s =>
        var x = c(s)
        while (x < c(s + 1)) { l(x) = s.toByte; x += 1 }
      }
      lut(i) = l
    }
    val mask = (1 << shift) - 1
    val states = Array.fill(n)(src0.u32le())
    val ctx = new Array[Int](n)
    val out = new Array[Byte](nOut)
    val chunk = nOut / n
    def step(j: Int, pos: Int): Unit = {
      val c = ctx(j)
      require(f(c) != null, s"cram: rANS Nx16 order-1 stream uses undeclared context $c")
      var st = states(j)
      val slot = (st & mask).toInt
      val sym = lut(c)(slot) & 0xff
      out(pos) = sym.toByte
      st = f(c)(sym) * (st >>> shift) + slot - cum(c)(sym)
      if (st < RANS_L) st = (st << 16) | src0.u16le()
      states(j) = st
      ctx(j) = sym
    }
    var k = 0
    while (k < chunk) {
      var j = 0
      while (j < n) { step(j, j * chunk + k); j += 1 }
      k += 1
    }
    if (n * chunk > 0) ctx(n - 1) = out(n * chunk - 1) & 0xff
    var p = n * chunk
    while (p < nOut) { step(n - 1, p); p += 1 }
    out
  }

  /** Literal stream holds one byte per run; symbols in the eligible set
    * (lead byte 0 = all 256) pull an extra-copy count from the meta
    * stream as a uint7.
    */
  private def rleDecode(meta: In, lit: Array[Byte], nOut: Int): Array[Byte] = {
    val eligible = new Array[Boolean](256)
    var nsym = meta.u8()
    if (nsym == 0) java.util.Arrays.fill(eligible, true)
    else while (nsym > 0) { eligible(meta.u8()) = true; nsym -= 1 }
    val out = new Array[Byte](nOut)
    var i = 0
    var o = 0
    while (o < nOut) {
      val s = lit(i) & 0xff
      i += 1
      out(o) = s.toByte
      o += 1
      if (eligible(s)) {
        var run = meta.u7()
        while (run > 0) { out(o) = s.toByte; o += 1; run -= 1 }
      }
    }
    out
  }

  /** Expand bit-packed values: 1/2/4 bits per value for alphabets of
    * <=2/<=4/<=16 symbols, low bits first; a 0/1-symbol alphabet repeats
    * its only symbol with no packed data at all.
    */
  private def packDecode(syms: Array[Byte], packed: Array[Byte], nOut: Int): Array[Byte] = {
    val nsym = syms.length
    val out = new Array[Byte](nOut)
    if (nsym <= 1) {
      java.util.Arrays.fill(out, if (nsym == 1) syms(0) else 0.toByte)
      return out
    }
    val (bits, per) =
      if (nsym <= 2) (1, 8)
      else if (nsym <= 4) (2, 4)
      else if (nsym <= 16) (4, 2)
      else throw new IllegalArgumentException(
        s"cram: rANS Nx16 PACK with $nsym symbols (max 16)")
    val mask = (1 << bits) - 1
    var i = 0
    while (i < nOut) {
      val v = (packed(i / per) & 0xff) >>> (bits * (i % per))
      out(i) = syms(v & mask)
      i += 1
    }
    out
  }
}
