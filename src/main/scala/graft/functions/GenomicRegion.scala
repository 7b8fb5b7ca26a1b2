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
  private val IntervalRe = "([0-9,]+)(?:-([0-9,]+))?".r

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

  /** A bare interval: `lo[-hi]`; a single number means the point [n, n]. */
  def parseInterval(interval: String): (Long, Long) = interval match {
    case IntervalRe(lo, hi) =>
      val l = lo.replace(",", "").toLong
      (l, Option(hi).map(_.replace(",", "").toLong).getOrElse(l))
    case _ =>
      throw new IllegalArgumentException(s"invalid interval: '$interval'")
  }
}
