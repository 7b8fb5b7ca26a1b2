package graft.tools

import java.io.InputStream

import org.apache.hadoop.fs.Path

import graft.sources.{Bgzf, BgzfStreamInputStream, Codecs, GziIndex}

/** `samtools faidx` equivalent for onboarding EXTERNAL fasta files: builds
  * the `.fai` (and, for bgzipped input, the `.gzi`) siblings an existing
  * file lacks, so indexed region reads, fai+gzi full-scan splits, and
  * `.fai`-metadata count(*) all apply to data the engine didn't write.
  *
  * One streaming pass derives the `.fai` (name, length, first-base offset
  * in the UNCOMPRESSED domain, line bases, line width); for BGZF input a
  * second header-only pass chains the block sizes into the `.gzi`. Like
  * samtools, refuses sequences with ragged interior line lengths — a wrong
  * index would silently return wrong bases.
  *
  * Usage: `runMain graft.tools.Faidx <path/to/ref.fa[.gz]> ...`
  */
object Faidx {

  /** Build and commit sibling indexes; returns the `.fai` line count. */
  def index(path: Path, conf: org.apache.hadoop.conf.Configuration): Long = {
    val fs = path.getFileSystem(conf)
    val name = path.getName.toLowerCase
    val compressed = Codecs.isCompressed(name)
    val isBgzf = compressed && {
      val in = fs.open(path)
      try Bgzf.looksLikeBgzf(new java.io.BufferedInputStream(in, 64))
      finally in.close()
    }
    require(!compressed || isBgzf,
      s"$path: plain gzip cannot be random-accessed; recompress with bgzip")

    // pass 1: fai over the decompressed byte stream
    val raw = fs.open(path)
    val stream: InputStream =
      if (isBgzf) new BgzfStreamInputStream(raw) else raw
    val fai = new StringBuilder
    var nSeqs = 0L
    try {
      val in = new java.io.BufferedInputStream(stream, 1 << 16)
      var pos = 0L
      var b = in.read()
      def readLine(): (String, Long) = {
        // returns (line without terminator, bytes consumed incl. terminator)
        val sb = new java.lang.StringBuilder(80)
        var n = 0L
        while (b >= 0 && b != '\n') {
          if (b != '\r') sb.append(b.toChar)
          n += 1
          b = in.read()
        }
        if (b == '\n') { n += 1; b = in.read() }
        (sb.toString, n)
      }
      while (b >= 0) {
        val (header, hLen) = readLine()
        require(header.nonEmpty && header.charAt(0) == '>',
          s"$path: expected '>' at uncompressed offset $pos, found '$header'")
        val seqName = {
          val h = header.substring(1)
          val sp = h.indexWhere(c => c == ' ' || c == '\t')
          if (sp < 0) h else h.substring(0, sp)
        }
        pos += hLen
        val seqOffset = pos
        var total = 0L
        var lineBases = -1L
        var lineWidth = -1L
        var prevLineBases = -1L
        while (b >= 0 && b != '>') {
          val (line, len) = readLine()
          pos += len
          if (line.nonEmpty) {
            require(prevLineBases == -1L || prevLineBases == lineBases,
              s"$path: sequence '$seqName' has ragged interior line " +
                "lengths; a line-addressed .fai cannot represent it")
            if (lineBases == -1L) { lineBases = line.length; lineWidth = len }
            prevLineBases = line.length
            total += line.length
          } else {
            // blank line ends the addressable body (samtools rejects
            // interior blanks followed by more sequence)
            require(b < 0 || b == '>',
              s"$path: blank line inside sequence '$seqName'")
          }
        }
        require(lineBases > 0, s"$path: empty sequence '$seqName'")
        fai.append(s"$seqName\t$total\t$seqOffset\t$lineBases\t$lineWidth\n")
        nSeqs += 1
      }
    } finally stream.close()

    val faiPath = new Path(path.getParent, path.getName + ".fai")
    val fo = fs.create(faiPath, true)
    try fo.write(fai.toString.getBytes("UTF-8")) finally fo.close()

    if (isBgzf) {
      // pass 2: chain block headers into the .gzi
      val in2 = fs.open(path)
      val blocks = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      try {
        var coff = 0L
        var uoff = 0L
        var blk = Bgzf.readBlock(in2)
        while (blk != null) {
          if (coff > 0 && blk.data.length > 0) blocks += ((coff, uoff))
          coff += blk.compressedSize
          uoff += blk.data.length
          blk = Bgzf.readBlock(in2)
        }
      } finally in2.close()
      val go = fs.create(GziIndex.gziPath(path), true)
      try GziIndex.write(go, blocks.toSeq) finally go.close()
    }
    nSeqs
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Faidx <fasta[.gz]> ...")
    val conf = new org.apache.hadoop.conf.Configuration()
    args.foreach { a =>
      val n = index(new Path(a), conf)
      println(s"$a: indexed $n sequences")
    }
  }
}
