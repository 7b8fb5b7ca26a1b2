package graft.sources.formats

import scala.collection.mutable

/** CRAM 3.1 name-tokeniser (tok3, block method 8) decoder, hand-decoded
  * from the public CRAMcodecs specification. samtools writes read names
  * with this codec by default in 3.1 files.
  *
  * Layout: ulen u32le, nnames u32le, flags u8 (bit 0: 1 = token streams
  * are arith-compressed (ArithDynamic), 0 = rANS Nx16), then token
  * streams until EOF. Each stream: type byte (bit7 = first stream of the next token
  * position, bit6 = duplicate of an earlier stream addressed by
  * (pos, type) byte pair, low 6 bits = token type), then uint7 compressed
  * length + a self-sized rANS Nx16 stream.
  *
  * Names decode one at a time: position 0's TYPE stream says DIFF (edit
  * against the name `dist` back, uint32 in the DIFF stream) or DUP
  * (verbatim copy, uint32 in DUP). Positions 1.. then read a token type
  * per surviving name: ALPHA (NUL-terminated string), CHAR (1 byte),
  * DIGITS (u32le rendered decimal), DIGITS0 (u32le zero-padded to the
  * DZLEN byte), DELTA/DELTA0 (u8 added to the diffed name's value),
  * MATCH (copy the diffed name's token), END.
  *
  * Separator convention: encoders differ on whether the byte that
  * terminates each name ('\0' or '\n') is carried as an ordinary
  * CHAR/MATCH token (the block then round-trips token-by-token) or is
  * implied — stripped by the encoder and re-appended by the decoder at
  * N_END, with ulen still counting it (htscodecs' reading of the spec).
  * This decoder accepts BOTH: if the explicit decode comes up exactly
  * nnames bytes short of ulen, the stream used the implicit convention
  * and `sep` is appended after each name.
  *
  * Known answers pinned by Tok3Spec against streams from tools/tok3.py,
  * an independent Python encoder+decoder from the same public spec
  * (both conventions exercised).
  */
object Tok3 {
  private val N_TYPE = 0
  private val N_ALPHA = 1
  private val N_CHAR = 2
  private val N_DIGITS0 = 3
  private val N_DZLEN = 4
  private val N_DUP = 5
  private val N_DIFF = 6
  private val N_DIGITS = 7
  private val N_DELTA = 8
  private val N_DELTA0 = 9
  private val N_MATCH = 10
  private val N_END = 12

  private final class S(val b: Array[Byte]) {
    var o = 0
    def u8(): Int = { val v = b(o) & 0xff; o += 1; v }
    def u32(): Long = {
      val v = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      o += 4; v
    }
    def cstr(): Array[Byte] = {
      var e = o
      while (b(e) != 0) e += 1
      val v = java.util.Arrays.copyOfRange(b, o, e)
      o = e + 1
      v
    }
  }

  private final case class Tok(typ: Int, s: Array[Byte], v: Long, padLen: Int)

  def decode(payload: Array[Byte]): Array[Byte] = decode(payload, 0.toByte)

  def decode(payload: Array[Byte], sep: Byte): Array[Byte] = {
    var o = 0
    def u8(): Int = { val v = payload(o) & 0xff; o += 1; v }
    def u7(): Int = {
      var v = 0; var c = 0
      do { c = u8(); v = (v << 7) | (c & 0x7f) } while ((c & 0x80) != 0)
      v
    }
    val ulen = (u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)).toLong & 0xffffffffL
    val nnames = (u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)).toLong & 0xffffffffL
    val useArith = u8()
    require(useArith == 0 || useArith == 1,
      s"cram: tok3 flags byte $useArith (want 0 = rANS Nx16, 1 = arith)")

    val streams = mutable.Map.empty[(Int, Int), S]
    var pos = -1
    while (o < payload.length) {
      val ttype = u8()
      val typ = ttype & 0x3f
      if ((ttype & 0x80) != 0) pos += 1
      if ((ttype & 0x40) != 0) {
        val dp = u8(); val dt = u8()
        streams((pos, typ)) = new S(streams((dp, dt)).b)
      } else {
        val clen = u7()
        val comp = java.util.Arrays.copyOfRange(payload, o, o + clen)
        o += clen
        streams((pos, typ)) = new S(
          if (useArith == 1) ArithDynamic.decode(comp, -1)
          else RansNx16.decode(comp, -1))
      }
    }

    val out = new java.io.ByteArrayOutputStream(ulen.toInt)
    val names = new Array[Array[Byte]](nnames.toInt)
    val tokLists = new Array[IndexedSeq[Tok]](nnames.toInt)
    var i = 0
    while (i < nnames) {
      val t0 = streams((0, N_TYPE)).u8()
      if (t0 == N_DUP) {
        val dist = streams((0, N_DUP)).u32().toInt
        names(i) = names(i - dist)
        tokLists(i) = tokLists(i - dist)
        out.write(names(i))
      } else {
        require(t0 == N_DIFF, s"cram: tok3 name opens with token $t0 (want DIFF/DUP)")
        val dist = streams((0, N_DIFF)).u32().toInt
        val prev: IndexedSeq[Tok] =
          if (dist > 0) tokLists(i - dist) else IndexedSeq.empty
        val toks = mutable.ArrayBuffer.empty[Tok]
        val name = new java.io.ByteArrayOutputStream()
        var t = 1
        var done = false
        while (!done) {
          val p: Tok = if (t - 1 < prev.length) prev(t - 1) else null
          streams((t, N_TYPE)).u8() match {
            case N_END => done = true
            case N_MATCH =>
              require(p != null, "cram: tok3 MATCH without a diffed token")
              toks += p
            case N_ALPHA =>
              toks += Tok(N_ALPHA, streams((t, N_ALPHA)).cstr(), -1, 0)
            case N_CHAR =>
              toks += Tok(N_CHAR, Array(streams((t, N_CHAR)).u8().toByte), -1, 0)
            case N_DIGITS =>
              val v = streams((t, N_DIGITS)).u32()
              toks += Tok(N_DIGITS, v.toString.getBytes("US-ASCII"), v, 0)
            case N_DIGITS0 =>
              val v = streams((t, N_DIGITS0)).u32()
              val l = streams((t, N_DZLEN)).u8()
              toks += Tok(N_DIGITS0, pad(v, l), v, l)
            case N_DELTA =>
              require(p != null && p.typ == N_DIGITS, "cram: tok3 DELTA without a DIGITS base")
              val v = p.v + streams((t, N_DELTA)).u8()
              toks += Tok(N_DIGITS, v.toString.getBytes("US-ASCII"), v, 0)
            case N_DELTA0 =>
              require(p != null && p.typ == N_DIGITS0, "cram: tok3 DELTA0 without a DIGITS0 base")
              val v = p.v + streams((t, N_DELTA0)).u8()
              toks += Tok(N_DIGITS0, pad(v, p.padLen), v, p.padLen)
            case other =>
              throw new IllegalStateException(s"cram: tok3 unexpected token type $other")
          }
          if (!done) { name.write(toks.last.s); t += 1 }
        }
        names(i) = name.toByteArray
        tokLists(i) = toks.toIndexedSeq
        out.write(names(i))
      }
      i += 1
    }
    val res = out.toByteArray
    if (res.length == ulen) res
    else if (res.length + nnames == ulen) {
      // Implicit-separator convention: the terminator after each name is
      // not a token; re-append it (htscodecs-style) to reach ulen.
      val fixed = new java.io.ByteArrayOutputStream(ulen.toInt)
      names.foreach { n => fixed.write(n); fixed.write(sep) }
      fixed.toByteArray
    } else throw new IllegalStateException(
      s"cram: tok3 decoded ${res.length} bytes for $nnames names, header says $ulen")
  }

  private def pad(v: Long, len: Int): Array[Byte] = {
    val s = v.toString
    val b = new Array[Byte](math.max(len, s.length))
    java.util.Arrays.fill(b, '0'.toByte)
    System.arraycopy(s.getBytes("US-ASCII"), 0, b, b.length - s.length, s.length)
    b
  }
}
