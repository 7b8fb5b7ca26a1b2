package graft.sources

import graft.sources.formats._

private object ProviderConf {
  /** Option flag with a session-conf fallback: `.option("parseTags", true)`
    * or `SET spark.graft.sam.parseTags=true` (the Spark spelling of the
    * reference's `SET exon.sam_parse_tags = true`).
    */
  def flag(opts: Map[String, String], optKeys: Seq[String], confKey: String): Boolean = {
    val fromOpt = optKeys.flatMap(k => opts.get(k)).headOption
    val v = fromOpt.orElse(
      org.apache.spark.sql.SparkSession.active.conf.getOption(confKey))
    v.exists(_.equalsIgnoreCase("true"))
  }
}

/** Option->format resolution shared between each dedicated provider and the
  * auto provider, so `format("graft")` on an inferred path threads region /
  * reference / typed-parse options into region-capable formats exactly as
  * the dedicated short names do (same pruning, same typed schemas).
  */
private[sources] object FormatResolvers {
  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  def fasta(opts: Map[String, String]): GraftFormat = {
    val regions: Seq[String] = opts.get("region").map(Seq(_)).getOrElse(Nil) ++
      opts.get("regionfile").toSeq.flatMap(p =>
        graft.functions.GenomicRegion.readRegionFile(p, hadoopConf))
    if (regions.nonEmpty) new FastaIndexedFormat(regions)
    else opts.get("sequencedatatype").orElse(opts.get("fasta.sequence_data_type")) match {
      case Some("integer_encode_dna") => new FastaIntegerFormat(dna = true)
      case Some("integer_encode_protein") => new FastaIntegerFormat(dna = false)
      case Some("utf8") | Some("large_utf8") | None => FastaFormat
      case Some(other) => throw new IllegalArgumentException(
        s"fasta: unknown sequenceDataType '$other'")
    }
  }

  def bed(opts: Map[String, String]): GraftFormat =
    opts.get("nfields").orElse(opts.get("n_fields")) match {
      case Some(n) => new BedNFieldsFormat(n.toInt)
      case None => BedFormat
    }

  def sam(opts: Map[String, String]): GraftFormat =
    if (ProviderConf.flag(opts, Seq("parsetags", "sam_parse_tags"),
        "spark.graft.sam.parseTags")) new SamTypedFormat
    else SamFormat

  def vcf(opts: Map[String, String]): GraftFormat = {
    val pi = ProviderConf.flag(opts, Seq("parseinfo", "vcf_parse_info"),
      "spark.graft.vcf.parseInfo")
    val pf = ProviderConf.flag(opts, Seq("parseformats", "vcf_parse_formats"),
      "spark.graft.vcf.parseFormats")
    if (pi || pf) new VcfTypedFormat(pi, pf) else VcfFormat
  }

  def cram(opts: Map[String, String]): GraftFormat = {
    val ref = opts.get("fastareference").orElse(opts.get("fasta_reference"))
    // The regions ALSO drive the reader-side row filter via regionColumns;
    // handing them to the format additionally enables container pruning by
    // header coordinates and the .crai index. boundsFromOptions is the same
    // helper the row filter resolves through, so the pruning set cannot
    // diverge and drop rows the filter would accept.
    val regions: Seq[(String, Long, Long)] =
      graft.functions.GenomicRegion.boundsFromOptions(opts, hadoopConf)
    if (ref.isEmpty && regions.isEmpty) CramFormat
    else new CramFormat(ref, regions)
  }

  def bigwigValue(opts: Map[String, String]): GraftFormat = {
    val regions = graft.functions.GenomicRegion.boundsFromOptions(opts, hadoopConf)
    if (regions.isEmpty) BigWigValueFormat else new BigWigValueFormat(regions)
  }
}

/** Concrete zero-arg providers, one per format, registered as DSv2 short
  * names in META-INF/services/org.apache.spark.sql.sources.DataSourceRegister
  * so `spark.read.format("fasta").load(path)` works — the Spark equivalent of
  * the reference's 23 `STORED AS` factory names
  * (exon/exon-core/src/session_context/exon_context_ext.rs:129-180).
  * SQL DDL works too: `CREATE TABLE t USING fasta LOCATION '...'`.
  */
class FastaSourceProvider extends GraftTableProvider(FastaFormat) {
  /** `.option("region", "a:3-4")` / `.option("regionFile", path)` switch the
    * table to indexed-subsequence extraction (fasta_indexed_scan parity).
    */
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.fasta(opts)
}
class FastqSourceProvider extends GraftTableProvider(FastqFormat)
class GffSourceProvider extends GraftTableProvider(GffFormat)
class GtfSourceProvider extends GraftTableProvider(GtfFormat)
class BedSourceProvider extends GraftTableProvider(BedFormat) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.bed(opts)
}
class HmmDomTabSourceProvider extends GraftTableProvider(HmmDomTabFormat)
class SamSourceProvider extends GraftTableProvider(SamFormat) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.sam(opts)
}
class VcfSourceProvider extends GraftTableProvider(VcfFormat) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.vcf(opts)
}
class SdfSourceProvider extends GraftTableProvider(SdfFormat)
class FcsSourceProvider extends GraftTableProvider(FcsFormat)
class GenBankSourceProvider extends GraftTableProvider(GenBankFormat)
class MzMlSourceProvider extends GraftTableProvider(MzMlFormat)
class BamSourceProvider extends GraftTableProvider(BamFormat)
class BcfSourceProvider extends GraftTableProvider(BcfFormat)
class CramSourceProvider extends GraftTableProvider(CramFormat) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.cram(opts)
}
/** Auto-detecting provider: picks the concrete format from the path's file
  * extension (compression suffixes stripped) — `spark.read.format("graft")
  * .load("x.vcf.gz")` parity with the reference's read_inferred_exon_table
  * (exon_context_ext.rs:697-717, extension map exon_file_type.rs:217-238).
  */
class GraftAutoSourceProvider extends GraftTableProvider(FastaFormat) {
  private val byExt: Map[String, GraftFormat] = Seq(
    FastaFormat, FastqFormat, GffFormat, GtfFormat, BedFormat, HmmDomTabFormat,
    SamFormat, VcfFormat, SdfFormat, FcsFormat, GenBankFormat, MzMlFormat,
    BamFormat, BcfFormat, BigWigValueFormat, CramFormat
  ).flatMap(f => f.defaultExtensions.map(_ -> f)).toMap

  override def shortName(): String = "graft"

  override protected def resolveFormat(opts: Map[String, String]): GraftFormat = {
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("graft auto-format requires a single path"))
    val base = Codecs.stripCompression(new org.apache.hadoop.fs.Path(path).getName)
      .toLowerCase
    val ext = base.substring(base.lastIndexOf('.') + 1)
    val inferred = byExt.getOrElse(ext, throw new IllegalArgumentException(
      s"graft: cannot infer format from extension '.$ext' " +
        s"(known: ${byExt.keys.toSeq.sorted.mkString(", ")})"))
    // Thread options through the SAME resolvers as the dedicated short
    // names, so an inferred read loses no pruning or typed parsing:
    // .option("region") on a .bw/.cram path still prunes via R-tree /
    // .crai, parseTags/parseInfo still switch to the typed schemas.
    inferred match {
      case FastaFormat => FormatResolvers.fasta(opts)
      case BedFormat => FormatResolvers.bed(opts)
      case SamFormat => FormatResolvers.sam(opts)
      case VcfFormat => FormatResolvers.vcf(opts)
      case CramFormat => FormatResolvers.cram(opts)
      case BigWigValueFormat => FormatResolvers.bigwigValue(opts)
      case other => other
    }
  }
}

class BigWigValueSourceProvider extends GraftTableProvider(BigWigValueFormat) {
  /** Regions additionally prune the bbi R-tree (blocks outside every
    * region are never read) — the row filter resolves through the same
    * bounds helper, so pruning can never drop a row the filter keeps.
    */
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    FormatResolvers.bigwigValue(opts)
}
class BigWigZoomSourceProvider extends GraftTableProvider(new BigWigZoomFormat(None)) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    new BigWigZoomFormat(
      opts.get("reductionlevel").orElse(opts.get("reduction_level")).map(_.toInt),
      graft.functions.GenomicRegion.boundsFromOptions(opts,
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}
