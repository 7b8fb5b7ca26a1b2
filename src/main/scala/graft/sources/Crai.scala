package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** CRAM `.crai` index: gzip'd text, one line per slice —
  * `seqId \t aliStart \t aliSpan \t containerOffset \t sliceOffset \t sliceSize`
  * (CRAM 3.0 spec §4; the reference prunes containers with it in
  * exon/exon-core/src/datasources/cram). `containerOffset` is the absolute
  * byte offset of the container header, which is exactly what a streaming
  * container walk needs to decide skip-vs-decode without decoding anything.
  */
object CraiIndex {

  final case class Entry(seqId: Int, start: Long, span: Long,
                         containerOffset: Long, sliceOffset: Long, sliceSize: Long)

  def craiPath(cram: Path): Path = new Path(cram.getParent, cram.getName + ".crai")

  def read(fs: FileSystem, cram: Path): Option[Seq[Entry]] = {
    val p = craiPath(cram)
    if (!fs.exists(p)) return None
    val in = new java.util.zip.GZIPInputStream(fs.open(p))
    try {
      Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val f = line.split('\t')
          Entry(f(0).toInt, f(1).toLong, f(2).toLong,
            f(3).toLong, f(4).toLong, f(5).toLong)
        }.toList)
    } finally in.close()
  }

  /** Absolute container offsets whose slices may overlap 1-based inclusive
    * [lo, hi] on reference id `refId`. Multi-reference slices (seqId -2)
    * are always kept — their contents can't be judged from the index line.
    */
  def wantedContainers(entries: Seq[Entry], refId: Int, lo: Long, hi: Long): Set[Long] =
    entries.iterator.filter { e =>
      e.seqId == -2 ||
        (e.seqId == refId && e.start <= hi && e.start + math.max(1L, e.span) - 1 >= lo)
    }.map(_.containerOffset).toSet
}
