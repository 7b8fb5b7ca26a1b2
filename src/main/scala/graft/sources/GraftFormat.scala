package graft.sources

import org.apache.spark.sql.types._

/** One file split handed to a format. Text formats consume `lines` (lazily
  * constructed; for a mid-file split it is pre-aligned to the first line at
  * or after the split start). Binary formats (FCS, mzML) consume `stream`
  * (the decompressed byte stream) directly — those are always whole-file
  * inputs. `end == Long.MaxValue` means whole file.
  */
final class RecordInput(mkLines: () => ByteLineReader, val stream: java.io.InputStream,
                        val end: Long, val isMidFileSplit: Boolean,
                        val isBgzfChunk: Boolean = false,
                        val reopenRaw: () => java.io.InputStream = () =>
                          throw new UnsupportedOperationException("reopen not available"),
                        val path: org.apache.hadoop.fs.Path = null,
                        val fs: org.apache.hadoop.fs.FileSystem = null) {
  lazy val lines: ByteLineReader = mkLines()
}

/** A file format the engine can scan: fixed schema + a record iterator.
  *
  * The iterator yields values for `required` data-column indices only (in
  * that order), as Catalyst internal values (UTF8String, Long, ArrayData…).
  * Column pruning therefore reaches the parser — unreferenced columns are
  * never materialized (SURVEY §4.1 projection pushdown).
  *
  * CONTRACT (no buffer reuse): every UTF8String / Array[Byte] a format
  * yields must be a FRESH immutable value — never a view into a buffer the
  * parser will overwrite for a later record. The columnar read path
  * (RefColumnVector in GraftDataSource.scala) stores these references
  * directly into the batch handed to Spark codegen with zero byte copies;
  * a reused backing buffer would silently corrupt earlier rows of the
  * batch. All current parsers copy out of their span/line buffers
  * (UTF8String.fromBytes with a fresh array, or fromString). A test in
  * ColumnarPathSpec scans each string-bearing format columnar and asserts
  * value stability across the whole batch.
  */
trait GraftFormat extends Serializable {
  def shortName: String
  def dataSchema: StructType
  /** Extensions (without dot) recognized when listing a directory. */
  def defaultExtensions: Seq[String]
  /** Uncompressed files may be split at record boundaries. */
  def splittable: Boolean = false

  /** Formats with file-driven schemas (FCS parameters, SDF data headers)
    * override this; called once on the driver with the listed files.
    * `open` yields the decompressed stream of a file.
    */
  def inferDataSchema(files: Seq[org.apache.hadoop.fs.FileStatus],
                      open: org.apache.hadoop.fs.FileStatus => java.io.InputStream): StructType =
    dataSchema

  def records(input: RecordInput, required: Array[Int]): Iterator[Array[Any]] =
    throw new UnsupportedOperationException(s"$shortName: records() not implemented")

  /** Schema-aware variant; default delegates to the fixed-schema one. */
  def records(input: RecordInput, schema: StructType, required: Array[Int]): Iterator[Array[Any]] =
    records(input, required)

  /** (chromosome col, interval-start col, interval-end col) if this format
    * carries genomic coordinates — enables tabix-index-driven region
    * pushdown (chunk pruning) and `.option("region", "chr1:1-100")`.
    * Point formats (VCF) use the same column for start and end.
    */
  def regionColumns: Option[(String, String, String)] = None

  /** True when the format consumes `region`/`regionFile` options itself
    * (indexed FASTA subsequence extraction, CRAM container pruning) rather
    * than through `regionColumns`-driven row filtering.
    */
  def handlesRegionsItself: Boolean = false

  /** True when the format's coordinates are 0-based half-open (BED, BigWig);
    * region strings are always 1-based inclusive, so the row-level overlap
    * test shifts accordingly.
    */
  def zeroBasedHalfOpen: Boolean = false
}

/** Base for one-line-per-record formats (GFF/GTF/BED/HMMDOMTAB/SAM/VCF…):
  * splittable for free, with comment/header line skipping.
  */
abstract class LineFormat extends GraftFormat {
  override def splittable: Boolean = true

  /** Lines to skip entirely (comments, headers). */
  def skipLine(line: String): Boolean = line.isEmpty || line.charAt(0) == '#'

  /** Parse one data line into the required columns; null to drop the line. */
  def parseLine(line: String, required: Array[Int]): Array[Any]

  final override def records(input: RecordInput, required: Array[Int]): Iterator[Array[Any]] =
    new Iterator[Array[Any]] {
      private var nextRow: Array[Any] = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null) {
          if (input.lines.nextLineStart >= input.end) return
          val line = input.lines.readLine()
          if (line == null) return
          if (!skipLine(line)) nextRow = parseLine(line, required)
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): Array[Any] = { val r = nextRow; advance(); r }
    }
}

object FormatUtil {
  import org.apache.spark.unsafe.types.UTF8String

  @inline def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** '.'-aware nullable string (the common "missing" marker in GFF/VCF/SAM). */
  @inline def dotNull(s: String): UTF8String =
    if (s == null || s.isEmpty || s == ".") null else UTF8String.fromString(s)

  @inline def dotNullLong(s: String): Any =
    if (s == null || s.isEmpty || s == ".") null else java.lang.Long.parseLong(s)

  @inline def dotNullFloat(s: String): Any =
    if (s == null || s.isEmpty || s == ".") null else java.lang.Float.parseFloat(s)

  def utf8Array(parts: Array[String]): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(p => UTF8String.fromString(p): Any))
}
