package graft.sources

import graft.sources.formats._

/** Concrete zero-arg providers, one per format, registered as DSv2 short
  * names in META-INF/services/org.apache.spark.sql.sources.DataSourceRegister
  * so `spark.read.format("fasta").load(path)` works — the Spark equivalent of
  * the reference's 23 `STORED AS` factory names
  * (exon/exon-core/src/session_context/exon_context_ext.rs:129-180).
  * SQL DDL works too: `CREATE TABLE t USING fasta LOCATION '...'`.
  */
class FastaSourceProvider extends GraftTableProvider(FastaFormat)
class FastqSourceProvider extends GraftTableProvider(FastqFormat)
class GffSourceProvider extends GraftTableProvider(GffFormat)
class GtfSourceProvider extends GraftTableProvider(GtfFormat)
class BedSourceProvider extends GraftTableProvider(BedFormat)
class HmmDomTabSourceProvider extends GraftTableProvider(HmmDomTabFormat)
class SamSourceProvider extends GraftTableProvider(SamFormat)
class VcfSourceProvider extends GraftTableProvider(VcfFormat)
class SdfSourceProvider extends GraftTableProvider(SdfFormat)
class FcsSourceProvider extends GraftTableProvider(FcsFormat)
class GenBankSourceProvider extends GraftTableProvider(GenBankFormat)
class MzMlSourceProvider extends GraftTableProvider(MzMlFormat)
class BamSourceProvider extends GraftTableProvider(BamFormat)
class BcfSourceProvider extends GraftTableProvider(BcfFormat)
class BigWigValueSourceProvider extends GraftTableProvider(BigWigValueFormat)
class BigWigZoomSourceProvider extends GraftTableProvider(new BigWigZoomFormat(None)) {
  override protected def resolveFormat(opts: Map[String, String]): GraftFormat =
    new BigWigZoomFormat(
      opts.get("reductionlevel").orElse(opts.get("reduction_level")).map(_.toInt))
}
