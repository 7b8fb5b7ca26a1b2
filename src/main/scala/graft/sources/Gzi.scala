package graft.sources

import java.io.OutputStream

import org.apache.hadoop.fs.{FileSystem, Path}

/** bgzip `.gzi` index (public htslib format): `u64le n` followed by `n`
  * little-endian pairs `(compressed_offset, uncompressed_offset)` — one per
  * BGZF block AFTER the first (block 0 is implicitly (0, 0)). Maps an
  * uncompressed byte offset to the BGZF virtual position that addresses it,
  * which is what turns a `.fai` (whose offsets are uncompressed-domain)
  * into random access over a bgzipped FASTA — `samtools faidx ref.fa.gz`
  * semantics.
  */
final class GziIndex(coffs: Array[Long], uoffs: Array[Long]) {

  def nBlocks: Int = coffs.length

  /** Virtual position addressing uncompressed offset `u`. */
  def virtualFor(u: Long): Long = {
    var lo = 0
    var hi = uoffs.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (uoffs(mid) <= u) lo = mid else hi = mid - 1
    }
    val within = u - uoffs(lo)
    require(within < (1L << 16),
      s"gzi: offset $u is ${within} bytes past block start ${uoffs(lo)} — " +
        "index does not list every block")
    (coffs(lo) << 16) | within
  }
}

object GziIndex {

  def gziPath(p: Path): Path = new Path(p.getParent, p.getName + ".gzi")

  def exists(fs: FileSystem, p: Path): Boolean = fs.exists(gziPath(p))

  def read(fs: FileSystem, p: Path): GziIndex = {
    val in = fs.open(gziPath(p))
    try {
      val d = new java.io.DataInputStream(new java.io.BufferedInputStream(in, 1 << 16))
      val n = java.lang.Long.reverseBytes(d.readLong())
      require(n >= 0 && n < Int.MaxValue, s"gzi: implausible entry count $n")
      val coffs = new Array[Long](n.toInt + 1)
      val uoffs = new Array[Long](n.toInt + 1)
      var i = 1
      while (i <= n) {
        coffs(i) = java.lang.Long.reverseBytes(d.readLong())
        uoffs(i) = java.lang.Long.reverseBytes(d.readLong())
        i += 1
      }
      new GziIndex(coffs, uoffs)
    } finally in.close()
  }

  def forFile(fs: FileSystem, p: Path): Option[GziIndex] =
    if (exists(fs, p)) Some(read(fs, p)) else None

  /** Serialize `(compressed, uncompressed)` block-start pairs (excluding
    * the implicit first block) in the htslib layout.
    */
  def write(out: OutputStream, blocks: Seq[(Long, Long)]): Unit = {
    val d = new java.io.DataOutputStream(out)
    d.writeLong(java.lang.Long.reverseBytes(blocks.length.toLong))
    blocks.foreach { case (c, u) =>
      d.writeLong(java.lang.Long.reverseBytes(c))
      d.writeLong(java.lang.Long.reverseBytes(u))
    }
    d.flush()
  }
}
