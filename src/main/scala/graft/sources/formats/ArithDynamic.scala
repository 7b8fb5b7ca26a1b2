package graft.sources.formats

/** Adaptive arithmetic decoder — CRAM 3.1 block method 6, hand-decoded
  * from the public CRAMcodecs specification (samtools/hts-specs). The
  * reference reads CRAM via noodles (exon/exon-cram); here the codec is
  * implemented directly.
  *
  * Stream = flags byte, then (unless NOSZ) the uncompressed length as a
  * uint7. Flags mirror rANS Nx16 except bit 2: ORDER1=1, EXT=4 (payload is
  * an external bzip2 stream), STRIPE=8, NOSZ=16, CAT=32, RLE=64, PACK=128.
  * STRIPE and PACK serialize exactly as in Nx16 (sub-stream lengths /
  * nsym+map+packed-length). RLE here is NOT the Nx16 side-meta variant:
  * runs are decoded inline from adaptive run models (first length byte
  * under the literal's context, continuations under a shared context,
  * chaining while a part reads 255).
  *
  * Entropy stage: a byte-wise carryless range coder (Subbotin/Shelwien
  * form, the one the public fqzcomp/htscodecs line uses): 32-bit range
  * initialised to 2^32-1, code primed with 5 bytes (the first is the
  * encoder's cache flush), renormalising a byte at a time while
  * range < 2^24. Symbols come from adaptive models: frequencies start at
  * 1, +16 per hit, halved (rounding up) when the total passes 2^16-17,
  * with a bubble-toward-front swap keeping hot symbols cheap to locate —
  * encoder and decoder apply identical updates, so the models stay in
  * lock-step. The payload opens with max_sym (0 = 256); order-1 keys one
  * model per previous byte.
  *
  * Known answers for every flag combination are pinned by ArithSpec
  * against streams from tools/arith.py, an independent Python encoder
  * written from the same public spec.
  */
object ArithDynamic {
  private val ORDER1 = 1
  private val EXT = 4
  private val STRIPE = 8
  private val NOSZ = 16
  private val CAT = 32
  private val RLE = 64
  private val PACK = 128

  private final class In(val b: Array[Byte], var o: Int) {
    def u8(): Int = { val v = b(o) & 0xff; o += 1; v }
    def u7(): Int = {
      var v = 0
      var c = 0
      var nb = 0
      do {
        c = u8(); v = (v << 7) | (c & 0x7f); nb += 1
        if (nb > 5 || v < 0)
          throw new IllegalStateException("cram: arith uint7 overflows 31 bits")
      } while ((c & 0x80) != 0)
      v
    }
    def read(n: Int): Array[Byte] = {
      require(n >= 0 && o + n <= b.length && o + n >= 0,
        s"cram: arith stream truncated (want $n bytes at $o of ${b.length})")
      val v = java.util.Arrays.copyOfRange(b, o, o + n); o += n; v
    }
  }

  def decode(payload: Array[Byte], knownLen: Int): Array[Byte] =
    decode(new In(payload, 0), knownLen)

  private def decode(src: In, knownLen: Int): Array[Byte] = {
    val flags = src.u8()
    val nOut =
      if ((flags & NOSZ) != 0) {
        require(knownLen >= 0, "cram: arith NOSZ stream needs an external size")
        knownLen
      } else src.u7()

    if ((flags & STRIPE) != 0) return decodeStripe(src, nOut)

    var outLen = nOut
    var packSyms: Array[Byte] = null
    var packFinal = 0
    if ((flags & PACK) != 0) {
      val nsym = src.u8()
      packSyms = src.read(nsym)
      packFinal = outLen
      outLen = src.u7() // packed length
    }

    var data =
      if ((flags & CAT) != 0) src.read(outLen)
      else if ((flags & EXT) != 0) {
        val in = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(src.b, src.o, src.b.length - src.o), true)
        val out = try in.readAllBytes() finally in.close()
        require(out.length == outLen,
          s"cram: arith EXT stream decoded ${out.length} bytes, want $outLen")
        out
      } else entropyDecode(src, outLen,
        order1 = (flags & ORDER1) != 0, rle = (flags & RLE) != 0)

    if (packSyms != null) data = unpack(packSyms, data, packFinal)
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

  private def entropyDecode(src: In, nOut: Int, order1: Boolean,
                            rle: Boolean): Array[Byte] = {
    if (nOut == 0) return Array.emptyByteArray
    val maxSym0 = src.u8()
    val maxSym = if (maxSym0 == 0) 256 else maxSym0
    val rc = new RangeDecoder(() => src.u8())
    val out = new Array[Byte](nOut)
    // order-0 keeps a single literal model; order-1 one per previous byte
    val lits = Array.fill(if (order1) maxSym else 1)(new ByteModel(maxSym))
    if (!rle) {
      var last = 0
      var i = 0
      while (i < nOut) {
        val s = lits(if (order1) last else 0).decode(rc)
        out(i) = s.toByte
        last = s
        i += 1
      }
    } else {
      // run models: index [sym] for a run's first length byte, [maxSym]
      // for every continuation (a part of 255 chains)
      val runs = Array.fill(maxSym + 1)(new ByteModel(256))
      var last = 0
      var i = 0
      while (i < nOut) {
        val s = lits(if (order1) last else 0).decode(rc)
        out(i) = s.toByte
        last = s
        i += 1
        var part = runs(s).decode(rc)
        var run = part
        while (part == 255) {
          part = runs(maxSym).decode(rc)
          run += part
        }
        require(i + run <= nOut,
          s"cram: arith RLE run of $run at $i overruns $nOut bytes")
        var k = 0
        while (k < run) { out(i) = s.toByte; i += 1; k += 1 }
      }
    }
    out
  }

  private def unpack(syms: Array[Byte], packed: Array[Byte], nOut: Int): Array[Byte] = {
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
        s"cram: arith PACK with $nsym symbols (max 16)")
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
