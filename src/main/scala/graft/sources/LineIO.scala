package graft.sources

import java.io.InputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Buffered line reader over a byte stream that tracks the byte offset of
  * every line start, so splittable formats can honor [start, end) ownership:
  * a record belongs to the split in which its first byte lies.
  *
  * Offsets are raw-stream offsets (file offsets for uncompressed reads);
  * compressed inputs are always read as a single whole-file split, where the
  * offsets are only used for monotonicity.
  */
final class ByteLineReader(in: InputStream, startOffset: Long) {
  private val buf = new Array[Byte](1 << 16)
  private var len = 0
  private var pos = 0
  private var eof = false
  private var off: Long = startOffset

  /** Byte offset of the first char of the most recently returned line. */
  var lastLineStart: Long = startOffset

  /** Offset of the next byte to be read — when positioned between lines,
    * the start offset of the line `readLine` would return next.
    */
  def nextLineStart: Long = off

  private def fill(): Unit = {
    if (eof) { pos = 0; len = 0; return }
    pos = 0
    len = 0
    while (len == 0) {
      val n = in.read(buf)
      if (n < 0) { eof = true; return }
      len = n
    }
  }

  /** Next line without its terminator (\n or \r\n); null at EOF. */
  def readLine(): String = {
    if (pos >= len) { fill(); if (pos >= len) return null }
    lastLineStart = off
    var sb: java.io.ByteArrayOutputStream = null
    while (true) {
      var i = pos
      while (i < len && buf(i) != '\n') i += 1
      if (i < len) {
        off += (i - pos + 1)
        val s =
          if (sb == null) {
            val e = if (i > pos && buf(i - 1) == '\r') i - 1 else i
            new String(buf, pos, e - pos, UTF_8)
          } else {
            sb.write(buf, pos, i - pos)
            stripCr(sb.toString(UTF_8))
          }
        pos = i + 1
        return s
      } else {
        if (sb == null) sb = new java.io.ByteArrayOutputStream(256)
        sb.write(buf, pos, len - pos)
        off += (len - pos)
        fill()
        if (pos >= len) return stripCr(sb.toString(UTF_8))
      }
    }
    null // unreachable
  }

  private def stripCr(s: String): String =
    if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s.substring(0, s.length - 1) else s
}

/** Compression handling by file extension. BGZF (.bgz, and most .gz files in
  * bioinformatics) is a multi-member gzip stream; both java.util.zip and the
  * multi-member loop below decode it transparently for full-file scans.
  */
object Codecs {
  private val gzipExts = Seq(".gz", ".gzip", ".bgz", ".bgzf")
  private val zstdExts = Seq(".zst", ".zstd")
  private val bzip2Exts = Seq(".bz2", ".bzip2")
  private val xzExts = Seq(".xz")
  private val allExts = gzipExts ++ zstdExts ++ bzip2Exts ++ xzExts

  def isCompressed(name: String): Boolean = {
    val n = name.toLowerCase
    allExts.exists(n.endsWith)
  }

  /** File name with any compression suffix removed. */
  def stripCompression(name: String): String = {
    val n = name.toLowerCase
    allExts.find(n.endsWith) match {
      case Some(ext) => name.substring(0, name.length - ext.length)
      case None      => name
    }
  }

  /** Wrap with the right decompressor based on the file name — same
    * extension dispatch as the reference (exon_file_type.rs:179-206:
    * GZIP/ZSTD/BZIP2/XZ). bzip2/xz come from commons-compress, already on
    * Spark's classpath; both read concatenated members.
    */
  def wrap(name: String, in: InputStream): InputStream = {
    val n = name.toLowerCase
    if (gzipExts.exists(n.endsWith)) new MultiMemberGzipInputStream(in)
    else if (zstdExts.exists(n.endsWith)) {
      val z = new com.github.luben.zstd.ZstdInputStream(in)
      z.setContinuous(true)
      z
    } else if (bzip2Exts.exists(n.endsWith))
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
        new java.io.BufferedInputStream(in, 1 << 16), true)
    else if (xzExts.exists(n.endsWith))
      new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(
        new java.io.BufferedInputStream(in, 1 << 16), true)
    else in
  }
}

/** GZIPInputStream that reliably reads across concatenated members (BGZF =
  * thousands of small gzip members per file). Java's built-in multi-member
  * support gives up at a member boundary when the underlying stream reports
  * available() == 0 (legitimate for network/object-store streams); the
  * wrapper keeps available() positive until true EOF so readTrailer always
  * probes for the next member header (EOF then ends the stream cleanly).
  */
final class MultiMemberGzipInputStream(raw: InputStream)
  extends java.util.zip.GZIPInputStream(
    new MultiMemberGzipInputStream.AvailablePositive(
      new java.io.BufferedInputStream(raw, 1 << 16)), 1 << 16)

object MultiMemberGzipInputStream {
  private final class AvailablePositive(in: InputStream)
    extends java.io.FilterInputStream(in) {
    override def available(): Int = {
      val a = in.available()
      if (a > 0) a else 1
    }
  }
}
