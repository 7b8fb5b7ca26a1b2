package graft.sources.formats

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** GFF3: 9 tab-separated columns; '.' = missing; attributes `k=v;k=v` with
  * comma-separated multi-values → MAP<STRING, ARRAY<STRING>>.
  * Schema per exon/exon-gff/src/config.rs:82-103; golden row
  * `sq0 caat 8 13 NULL + NULL` (gff-scan-tests.slt:7-10).
  */
object GffFormat extends LineFormat with IndexableGraftFormat {
  override def shortName: String = "gff"
  override def defaultExtensions: Seq[String] = Seq("gff", "gff3")
  override def regionColumns: Option[(String, String, String)] =
    Some(("seqname", "start", "end"))
  override val dataSchema: StructType = StructType(Seq(
    StructField("seqname", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("type", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("score", FloatType, nullable = true),
    StructField("strand", StringType, nullable = false),
    StructField("phase", StringType, nullable = true),
    StructField("attributes",
      MapType(StringType, ArrayType(StringType, containsNull = true), valueContainsNull = true),
      nullable = true)))

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    if (line.startsWith(">")) return null // FASTA directive section terminates features
    val f = line.split('\t')
    if (f.length < 8) return null
    required.map {
      case 0 => utf8(f(0))
      case 1 => dotNull(f(1))
      case 2 => utf8(f(2))
      case 3 => java.lang.Long.parseLong(f(3))
      case 4 => java.lang.Long.parseLong(f(4))
      case 5 => dotNullFloat(f(5))
      case 6 => utf8(f(6))
      case 7 => dotNull(f(7))
      case 8 => if (f.length < 9) null else parseAttributes(f(8))
    }
  }

  /** Byte-span parse (the hot path): tab-split on the raw span, numeric
    * fields parsed digit-wise, strings copied once with no UTF-16
    * transcode. Attributes (rarely projected — column pruning drops them
    * for coordinate queries) reuse the String-based map parser.
    */
  override def parsesBytes: Boolean = true
  private val scratch = new ThreadLocal[SpanFields] {
    override def initialValue(): SpanFields = new SpanFields(16)
  }
  override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                              required: Array[Int]): Array[Any] =
    parseWith(scratch.get(), b, off, len, required)

  /** One ThreadLocal probe per CHUNK instead of per line (see
    * LineFormat.byteParser).
    */
  override protected def byteParser(required: Array[Int])
      : LineFormat.ByteLineParser = {
    val f = scratch.get()
    new LineFormat.ByteLineParser {
      def parse(b: Array[Byte], off: Int, len: Int): Array[Any] =
        parseWith(f, b, off, len, required)
    }
  }

  private def parseWith(f: SpanFields, b: Array[Byte], off: Int, len: Int,
                        required: Array[Int]): Array[Any] = {
    if (len > 0 && b(off) == '>') return null // FASTA directive section
    val nf = f.split(b, off, len, '\t')
    if (nf < 8) return null
    // while + @switch: see the r17 VCF parse notes (required.map dispatch)
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      out(k) = (required(k): @scala.annotation.switch) match {
        case 0 => utf8Span(b, f.off(0), f.len(0))
        case 1 => dotNullSpan(b, f.off(1), f.len(1))
        case 2 => utf8Span(b, f.off(2), f.len(2))
        case 3 => parseLongSpan(b, f.off(3), f.len(3))
        case 4 => parseLongSpan(b, f.off(4), f.len(4))
        case 5 => dotNullFloatSpan(b, f.off(5), f.len(5))
        case 6 => utf8Span(b, f.off(6), f.len(6))
        case 7 => dotNullSpan(b, f.off(7), f.len(7))
        case 8 => if (nf < 9) null
          else parseAttributes(spanString(b, f.off(8), f.len(8)))
      }
      k += 1
    }
    out
  }

  private def parseAttributes(s: String): ArrayBasedMapData = {
    val pairs = s.split(';').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val eq = kv.indexOf('=')
      val k = if (eq < 0) kv else kv.substring(0, eq)
      val v = if (eq < 0) "" else kv.substring(eq + 1)
      (utf8(pctDecode(k)): Any,
        utf8Array(v.split(',').map(pctDecode)): Any)
    }.toArray
    new ArrayBasedMapData(
      new GenericArrayData(pairs.map(_._1)), new GenericArrayData(pairs.map(_._2)))
  }

  /** GFF3 column-9 reserved characters (';' '=' ',' '%' and control chars)
    * are percent-encoded on write and decoded on read — a value containing
    * ';' or ',' must survive the round trip, and a literal tab/newline would
    * corrupt record framing and the sibling .tbi offsets.
    */
  private def pctEncode(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == '%' || c == ';' || c == '=' || c == ',' ||
        c == '\t' || c == '\n' || c == '\r'
      i += 1
    }
    if (!needs) s
    else {
      val sb = new java.lang.StringBuilder(s.length + 8)
      s.foreach {
        case '%' => sb.append("%25")
        case ';' => sb.append("%3B")
        case '=' => sb.append("%3D")
        case ',' => sb.append("%2C")
        case '\t' => sb.append("%09")
        case '\n' => sb.append("%0A")
        case '\r' => sb.append("%0D")
        case c => sb.append(c)
      }
      sb.toString
    }
  }

  private def pctDecode(s: String): String = {
    if (s.indexOf('%') < 0) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (c == '%' && j + 2 < s.length) {
          val h = Character.digit(s.charAt(j + 1), 16)
          val l = Character.digit(s.charAt(j + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); j += 3 }
          else { sb.append(c); j += 1 }
        } else { sb.append(c); j += 1 }
      }
      sb.toString
    }
  }

  // ---- sink (annotation write-side of the tabix pruning shape) ----------

  override def fileHeader: Option[String] = Some("##gff-version 3\n")

  override def tabixPreset: (Int, Int, Int, Int) = (0, 1, 4, 5) // tabix -p gff

  override def writeRecord(values: Array[Any], out: StringBuilder): Unit = {
    def dot(v: Any): Unit = if (v == null) out.append('.') else out.append(v)
    out.append(values(0)).append('\t')
    dot(values(1)); out.append('\t')
    out.append(values(2)).append('\t').append(values(3)).append('\t')
    out.append(values(4)).append('\t')
    values(5) match {
      case null => out.append('.')
      case f: java.lang.Float =>
        if (f.floatValue == f.intValue.toFloat) out.append(f.intValue)
        else out.append(f.floatValue)
      case other => out.append(other)
    }
    out.append('\t').append(values(6)).append('\t')
    dot(values(7)); out.append('\t')
    values(8) match {
      case null => out.append('.')
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) out.append(';')
          out.append(pctEncode(ks.getUTF8String(i).toString)).append('=')
          val arr = vs.getArray(i)
          var j = 0
          while (j < arr.numElements()) {
            if (j > 0) out.append(',')
            out.append(pctEncode(arr.getUTF8String(j).toString))
            j += 1
          }
          i += 1
        }
      case other => out.append(other)
    }
    out.append('\n')
  }

  override def recordRegion(values: Array[Any]): (String, Long, Long) =
    (String.valueOf(values(0)), values(3).asInstanceOf[Long] - 1,
      values(4).asInstanceOf[Long])
}

/** GTF: GFF columns but `frame` and flat MAP<STRING,STRING> attributes in
  * `key "value";` form (exon/exon-gtf/src/config.rs:28-41).
  */
object GtfFormat extends LineFormat with IndexableGraftFormat {
  override def shortName: String = "gtf"
  override def defaultExtensions: Seq[String] = Seq("gtf")
  override def regionColumns: Option[(String, String, String)] =
    Some(("seqname", "start", "end"))
  override val dataSchema: StructType = StructType(Seq(
    StructField("seqname", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("type", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("score", FloatType, nullable = true),
    StructField("strand", StringType, nullable = true),
    StructField("frame", StringType, nullable = true),
    StructField("attributes", MapType(StringType, StringType, valueContainsNull = true),
      nullable = true)))

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    val f = line.split('\t')
    if (f.length < 8) return null
    required.map {
      case 0 => utf8(f(0))
      case 1 => dotNull(f(1))
      case 2 => utf8(f(2))
      case 3 => java.lang.Long.parseLong(f(3))
      case 4 => java.lang.Long.parseLong(f(4))
      case 5 => dotNullFloat(f(5))
      case 6 => dotNull(f(6))
      case 7 => dotNull(f(7))
      case 8 => if (f.length < 9) null else parseAttributes(f(8))
    }
  }

  /** Byte-span parse, mirroring GffFormat's (GTF differs only in the
    * attribute form, which reuses the String-based parser when projected).
    */
  override def parsesBytes: Boolean = true
  private val scratch = new ThreadLocal[SpanFields] {
    override def initialValue(): SpanFields = new SpanFields(16)
  }
  override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                              required: Array[Int]): Array[Any] =
    parseWith(scratch.get(), b, off, len, required)

  /** One ThreadLocal probe per CHUNK instead of per line (see
    * LineFormat.byteParser).
    */
  override protected def byteParser(required: Array[Int])
      : LineFormat.ByteLineParser = {
    val f = scratch.get()
    new LineFormat.ByteLineParser {
      def parse(b: Array[Byte], off: Int, len: Int): Array[Any] =
        parseWith(f, b, off, len, required)
    }
  }

  private def parseWith(f: SpanFields, b: Array[Byte], off: Int, len: Int,
                        required: Array[Int]): Array[Any] = {
    val nf = f.split(b, off, len, '\t')
    if (nf < 8) return null
    // while + @switch: see the r17 VCF parse notes (required.map dispatch)
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      out(k) = (required(k): @scala.annotation.switch) match {
        case 0 => utf8Span(b, f.off(0), f.len(0))
        case 1 => dotNullSpan(b, f.off(1), f.len(1))
        case 2 => utf8Span(b, f.off(2), f.len(2))
        case 3 => parseLongSpan(b, f.off(3), f.len(3))
        case 4 => parseLongSpan(b, f.off(4), f.len(4))
        case 5 => dotNullFloatSpan(b, f.off(5), f.len(5))
        case 6 => dotNullSpan(b, f.off(6), f.len(6))
        case 7 => dotNullSpan(b, f.off(7), f.len(7))
        case 8 => if (nf < 9) null
          else parseAttributes(spanString(b, f.off(8), f.len(8)))
      }
      k += 1
    }
    out
  }

  private def parseAttributes(s: String): ArrayBasedMapData = {
    val pairs = s.split(';').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val sp = kv.indexOf(' ')
      val k = if (sp < 0) kv else kv.substring(0, sp)
      val v = if (sp < 0) "" else kv.substring(sp + 1).trim.stripPrefix("\"").stripSuffix("\"")
      (utf8(k): Any, utf8(v): Any)
    }.toArray
    new ArrayBasedMapData(
      new GenericArrayData(pairs.map(_._1)), new GenericArrayData(pairs.map(_._2)))
  }

  // ---- sink: GTF's `key "value";` attribute form over the GFF column
  // layout; same tabix preset (coordinates are identical). Values keep
  // their quotes verbatim — GTF has no percent-encoding convention, but a
  // literal tab/newline would corrupt framing, so those are refused.

  override def tabixPreset: (Int, Int, Int, Int) = (0, 1, 4, 5)

  override def writeRecord(values: Array[Any], out: StringBuilder): Unit = {
    def dot(v: Any): Unit = if (v == null) out.append('.') else out.append(v)
    out.append(values(0)).append('\t')
    dot(values(1)); out.append('\t')
    out.append(values(2)).append('\t').append(values(3)).append('\t')
    out.append(values(4)).append('\t')
    values(5) match {
      case null => out.append('.')
      case f: java.lang.Float =>
        if (f.floatValue == f.intValue.toFloat) out.append(f.intValue)
        else out.append(f.floatValue)
      case other => out.append(other)
    }
    out.append('\t')
    dot(values(6)); out.append('\t')
    dot(values(7)); out.append('\t')
    values(8) match {
      case null => ()
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) out.append(' ')
          val v = vs.getUTF8String(i).toString
          if (v.indexOf('\t') >= 0 || v.indexOf('\n') >= 0)
            throw new IllegalArgumentException(
              s"gtf write: attribute value contains tab/newline: $v")
          out.append(ks.getUTF8String(i)).append(" \"").append(v).append("\";")
          i += 1
        }
      case other => out.append(other)
    }
    out.append('\n')
  }

  override def recordRegion(values: Array[Any]): (String, Long, Long) =
    (String.valueOf(values(0)), values(3).asInstanceOf[Long] - 1,
      values(4).asInstanceOf[Long])
}

/** BED 3..12 columns (`n_fields` option, default 12); missing trailing
  * columns are null; raw 0-based coordinates are preserved
  * (bed-select-tests.slt golden `chr1 11873 12227 …`).
  */
object BedFormat extends LineFormat with IndexableGraftFormat {
  override def shortName: String = "bed"
  override def defaultExtensions: Seq[String] = Seq("bed")
  override def regionColumns: Option[(String, String, String)] =
    Some(("reference_sequence_name", "start", "end"))
  override def zeroBasedHalfOpen: Boolean = true
  override val dataSchema: StructType = StructType(Seq(
    StructField("reference_sequence_name", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", LongType, nullable = true),
    StructField("strand", StringType, nullable = true),
    StructField("thick_start", LongType, nullable = true),
    StructField("thick_end", LongType, nullable = true),
    StructField("color", StringType, nullable = true),
    StructField("block_count", LongType, nullable = true),
    StructField("block_sizes", StringType, nullable = true),
    StructField("block_starts", StringType, nullable = true)))

  override def skipLine(line: String): Boolean =
    line.isEmpty || line.charAt(0) == '#' ||
      line.startsWith("browser") || line.startsWith("track")

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    val f = line.split('\t')
    if (f.length < 3) return null
    def str(i: Int): Any = if (i >= f.length) null else dotNull(f(i))
    def lng(i: Int): Any = if (i >= f.length) null else dotNullLong(f(i))
    required.map {
      case 0 => utf8(f(0))
      case 1 => java.lang.Long.parseLong(f(1))
      case 2 => java.lang.Long.parseLong(f(2))
      case i @ (4 | 6 | 7 | 9) => lng(i)
      case i => str(i)
    }
  }

  override def parsesBytes: Boolean = true
  override def skipLineBytes(b: Array[Byte], off: Int, len: Int): Boolean =
    len == 0 || b(off) == '#' ||
      spanStartsWith(b, off, len, "browser") || spanStartsWith(b, off, len, "track")
  private val scratch = new ThreadLocal[SpanFields] {
    override def initialValue(): SpanFields = new SpanFields(12)
  }
  override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                              required: Array[Int]): Array[Any] =
    parseWith(scratch.get(), b, off, len, required)

  /** One ThreadLocal probe per CHUNK instead of per line (see
    * LineFormat.byteParser).
    */
  override protected def byteParser(required: Array[Int])
      : LineFormat.ByteLineParser = sharedByteParser(required)

  /** Shared with [[BedNFieldsFormat]] (same columns, narrower schema). */
  private[formats] def sharedByteParser(required: Array[Int])
      : LineFormat.ByteLineParser = {
    val f = scratch.get()
    new LineFormat.ByteLineParser {
      def parse(b: Array[Byte], off: Int, len: Int): Array[Any] =
        parseWith(f, b, off, len, required)
    }
  }

  private def parseWith(f: SpanFields, b: Array[Byte], off: Int,
                        len: Int, required: Array[Int]): Array[Any] = {
    val nf = f.split(b, off, len, '\t')
    if (nf < 3) return null
    def str(i: Int): Any = if (i >= nf) null else dotNullSpan(b, f.off(i), f.len(i))
    def lng(i: Int): Any = if (i >= nf) null else dotNullLongSpan(b, f.off(i), f.len(i))
    // while + @switch: see the r17 VCF parse notes (required.map dispatch)
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      out(k) = (required(k): @scala.annotation.switch) match {
        case 0 => utf8Span(b, f.off(0), f.len(0))
        case 1 => parseLongSpan(b, f.off(1), f.len(1))
        case 2 => parseLongSpan(b, f.off(2), f.len(2))
        case 4 | 6 | 7 | 9 => lng(required(k))
        case i => str(i)
      }
      k += 1
    }
    out
  }

  // ---- sink: prefix-truncated BED (fields after the last non-null column
  // are omitted, matching the reader's nFields model; interior nulls write
  // the '.' placeholder UCSC tools accept) --------------------------------

  override def tabixPreset: (Int, Int, Int, Int) = (0x10000, 1, 2, 3) // -p bed

  override def writeRecord(values: Array[Any], out: StringBuilder): Unit = {
    var last = values.length - 1
    while (last > 2 && values(last) == null) last -= 1
    var i = 0
    while (i <= last) {
      if (i > 0) out.append('\t')
      if (values(i) == null) out.append('.') else out.append(values(i))
      i += 1
    }
    out.append('\n')
  }

  /** BED is natively 0-based half-open — coordinates index as stored. */
  override def recordRegion(values: Array[Any]): (String, Long, Long) =
    (String.valueOf(values(0)), values(1).asInstanceOf[Long],
      values(2).asInstanceOf[Long])
}

/** BED restricted to the first `n` columns (the reference's `n_fields`
  * table option, 3..=12; exon-bed/src/schema.rs:27-49).
  */
final class BedNFieldsFormat(n: Int) extends LineFormat {
  require(n >= 3 && n <= 12, s"bed: n_fields must be in 3..12, got $n")
  override def shortName: String = "bed"
  override def defaultExtensions: Seq[String] = Seq("bed")
  override def regionColumns: Option[(String, String, String)] = BedFormat.regionColumns
  override val dataSchema: StructType = StructType(BedFormat.dataSchema.fields.take(n))
  override def skipLine(line: String): Boolean = BedFormat.skipLine(line)
  override def parseLine(line: String, required: Array[Int]): Array[Any] =
    BedFormat.parseLine(line, required)
  override def parsesBytes: Boolean = true
  override def skipLineBytes(b: Array[Byte], off: Int, len: Int): Boolean =
    BedFormat.skipLineBytes(b, off, len)
  override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                              required: Array[Int]): Array[Any] =
    BedFormat.parseLineBytes(b, off, len, required)
  override protected def byteParser(required: Array[Int])
      : LineFormat.ByteLineParser = BedFormat.sharedByteParser(required)
}

/** HMMER domain table: whitespace-delimited, 22 fixed columns + free-text
  * description tail (exon datasources/hmmdomtab/hmm_dom_schema_builder.rs:44-66).
  */
object HmmDomTabFormat extends LineFormat {
  override def shortName: String = "hmmdomtab"
  override def defaultExtensions: Seq[String] = Seq("hmmdomtab", "domtblout", "domtab")
  override val dataSchema: StructType = StructType(Seq(
    StructField("target_name", StringType, nullable = false),
    StructField("target_accession", StringType, nullable = true),
    StructField("tlen", LongType, nullable = false),
    StructField("query_name", StringType, nullable = false),
    StructField("accession", StringType, nullable = true),
    StructField("qlen", LongType, nullable = false),
    StructField("evalue", DoubleType, nullable = false),
    StructField("sequence_score", DoubleType, nullable = false),
    StructField("bias", DoubleType, nullable = false),
    StructField("domain_number", LongType, nullable = false),
    StructField("ndom", LongType, nullable = false),
    StructField("conditional_evalue", DoubleType, nullable = false),
    StructField("independent_evalue", DoubleType, nullable = false),
    StructField("domain_score", DoubleType, nullable = false),
    StructField("domain_bias", DoubleType, nullable = false),
    StructField("hmm_from", LongType, nullable = false),
    StructField("hmm_to", LongType, nullable = false),
    StructField("ali_from", LongType, nullable = false),
    StructField("ali_to", LongType, nullable = false),
    StructField("env_from", LongType, nullable = false),
    StructField("env_to", LongType, nullable = false),
    StructField("accuracy", DoubleType, nullable = false),
    StructField("description", StringType, nullable = true)))

  private val longCols = Set(2, 5, 9, 10, 15, 16, 17, 18, 19, 20)
  private val doubleCols = Set(6, 7, 8, 11, 12, 13, 14, 21)

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    val f = line.trim.split("\\s+", 23)
    if (f.length < 22) return null
    required.map { i =>
      if (i == 22) { if (f.length < 23) null else dotNull(f(22)) }
      else if (longCols.contains(i)) java.lang.Long.parseLong(f(i))
      else if (doubleCols.contains(i)) java.lang.Double.parseDouble(f(i))
      else dotNull(f(i))
    }
  }

  /** Byte-span parse: whitespace-run split (limit 23 — the description
    * field keeps its interior spaces verbatim); doubles still go through
    * Double.parseDouble on a per-field mini-String (exact grammar match),
    * everything else stays on the span.
    */
  override def parsesBytes: Boolean = true
  private val scratch = new ThreadLocal[SpanFields] {
    override def initialValue(): SpanFields = new SpanFields(23)
  }
  override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                              required: Array[Int]): Array[Any] =
    parseWith(scratch.get(), b, off, len, required)

  /** One ThreadLocal probe per CHUNK instead of per line (see
    * LineFormat.byteParser).
    */
  override protected def byteParser(required: Array[Int])
      : LineFormat.ByteLineParser = {
    val f = scratch.get()
    new LineFormat.ByteLineParser {
      def parse(b: Array[Byte], off: Int, len: Int): Array[Any] =
        parseWith(f, b, off, len, required)
    }
  }

  private def parseWith(f: SpanFields, b: Array[Byte], off: Int, len: Int,
                        required: Array[Int]): Array[Any] = {
    var s = off
    var e = off + len
    while (s < e && (b(s) & 0xff) <= ' ') s += 1
    while (e > s && (b(e - 1) & 0xff) <= ' ') e -= 1
    val nf = f.splitWs(b, s, e - s, 23)
    if (nf < 22) return null
    // while loop: see the r17 VCF parse notes (required.map dispatch)
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      val i = required(k)
      out(k) =
        if (i == 22) { if (nf < 23) null else dotNullSpan(b, f.off(22), f.len(22)) }
        else if (longCols.contains(i)) parseLongSpan(b, f.off(i), f.len(i))
        else if (doubleCols.contains(i))
          java.lang.Double.parseDouble(spanString(b, f.off(i), f.len(i)))
        else dotNullSpan(b, f.off(i), f.len(i))
      k += 1
    }
    out
  }
}
