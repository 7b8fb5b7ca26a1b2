package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed read API mirroring the reference's `ExonSession.read_*` surface
  * (exon_context_ext.rs:314-717) as an implicit extension:
  *
  * {{{
  * import graft.GraftReaders._
  * val df = spark.readFasta("/data/ref.fasta")
  * val v  = spark.readVcf("/data/x.vcf.gz", Map("region" -> "chr1:1-100"))
  * }}}
  *
  * Every method is sugar over `spark.read.format(<fmt>).options(...).load`
  * — options are the reader options documented per format (region,
  * regionFile, compression, fileExtension, parseTags/parseInfo/
  * parseFormats, fastaReference, reductionLevel, nFields,
  * sequenceDataType). `readInferred` auto-detects the format from the
  * path's extension (read_inferred_exon_table parity).
  */
object GraftReaders {

  implicit final class GraftSessionOps(private val spark: SparkSession) extends AnyVal {
    private def rd(fmt: String, path: String, opts: Map[String, String]): DataFrame = {
      GraftSession.registerAll(spark)
      spark.read.format(fmt).options(opts).load(path)
    }

    def readFasta(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("fasta", path, opts)
    def readFastq(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("fastq", path, opts)
    def readGff(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("gff", path, opts)
    def readGtf(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("gtf", path, opts)
    def readBed(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("bed", path, opts)
    def readHmmDomTab(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("hmmdomtab", path, opts)
    def readGenBank(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("genbank", path, opts)
    def readMzMl(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("mzml", path, opts)
    def readFcs(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("fcs", path, opts)
    def readSdf(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("sdf", path, opts)
    def readSam(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("sam", path, opts)
    def readBam(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("bam", path, opts)
    def readCram(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("cram", path, opts)
    def readVcf(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("vcf", path, opts)
    def readBcf(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("bcf", path, opts)
    def readBigWigValue(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("bigwig_value", path, opts)
    def readBigWigZoom(path: String, reductionLevel: Int,
                       opts: Map[String, String] = Map.empty): DataFrame =
      rd("bigwig_zoom", path, opts + ("reductionLevel" -> reductionLevel.toString))
    /** Format auto-detected from the extension (compression stripped). */
    def readInferred(path: String, opts: Map[String, String] = Map.empty): DataFrame =
      rd("graft", path, opts)
  }
}
