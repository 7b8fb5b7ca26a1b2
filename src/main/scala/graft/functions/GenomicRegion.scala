package graft.functions

/** A parsed samtools-style genomic region: `name[:start[-end]]`, 1-based
  * inclusive coordinates. `chr1` = whole sequence; `chr1:100` = 100 to end;
  * `chr1:100-200` = [100, 200].
  *
  * Mirrors the region strings accepted by the reference's `*_region_filter` /
  * `region_match` UDFs (/root/reference/exon/exon-core/src/udfs/vcf/mod.rs:39-120).
  */
final case class GenomicRegion(name: String, start: Option[Long], end: Option[Long]) {
  /** Containment: is a point position inside the region (VCF semantics). */
  def containsPos(pos: Long): Boolean =
    start.forall(pos >= _) && end.forall(pos <= _)

  /** Overlap: does [s, e] intersect the region (BAM/GFF/BigWig semantics). */
  def overlaps(s: Long, e: Long): Boolean =
    start.forall(e >= _) && end.forall(s <= _)
}

object GenomicRegion {
  // each bound must contain at least one digit — a stray comma would
  // otherwise parse to an empty string and NumberFormatException mid-plan
  private val IntervalRe = "([0-9][0-9,]*)(?:-([0-9][0-9,]*))?".r

  def parse(region: String): GenomicRegion = {
    val colon = region.lastIndexOf(':')
    if (colon < 0) GenomicRegion(region, None, None)
    else region.substring(colon + 1) match {
      case IntervalRe(lo, hi) =>
        GenomicRegion(region.substring(0, colon),
          Some(lo.replace(",", "").toLong),
          Option(hi).map(_.replace(",", "").toLong))
      case _ =>
        // Colon but no numeric suffix: the whole string is the name.
        GenomicRegion(region, None, None)
    }
  }

  /** Parse to 1-based inclusive bounds with open ends defaulted, the form
    * index queries and row filters consume.
    */
  def toBounds(region: String): (String, Long, Long) = {
    val g = parse(region)
    (g.name, g.start.getOrElse(1L), g.end.getOrElse(Long.MaxValue / 2))
  }

  /** Read a region file (one region per line, blanks ignored) through the
    * Hadoop FS API — shared by reader options and the indexed UDTFs.
    */
  def readRegionFile(path: String,
                     conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val in = hp.getFileSystem(conf).open(hp)
    try scala.io.Source.fromInputStream(in).getLines().map(_.trim)
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The region ∪ regionFile union of a normalized options map as bounds —
    * the ONE definition shared by the reader-side row filter
    * (GraftTable.regionsOption) and format-level pruning (e.g. CRAM
    * container pruning), so the pruning set can never diverge from the
    * filter set and drop rows the filter would accept.
    */
  def boundsFromOptions(opts: Map[String, String],
                        conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long, Long)] =
    (opts.get("region").toSeq ++
      opts.get("regionfile").toSeq.flatMap(p => readRegionFile(p, conf)))
      .map(toBounds)

  /** A bare interval: `lo[-hi]`; a single number means the point [n, n]. */
  def parseInterval(interval: String): (Long, Long) = interval match {
    case IntervalRe(lo, hi) =>
      val l = lo.replace(",", "").toLong
      (l, Option(hi).map(_.replace(",", "").toLong).getOrElse(l))
    case _ =>
      throw new IllegalArgumentException(s"invalid interval: '$interval'")
  }
}
