package graft.sources.formats

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** SAM (text alignment format): tab-separated records, '@' header lines
  * skipped. Schema mirrors the reference's SAM schema
  * (exon/exon-sam/src/schema_builder.rs:371-401):
  *  - `end` is computed from CIGAR reference consumption (1-based inclusive;
  *    golden `ref1_grp1_p001 99 ref1 1 10 0 10M ref1`, sam-select-tests.slt:7-10),
  *  - `quality_score` is the Phred+33-decoded list,
  *  - `mate_reference` '=' resolves to the read's own reference,
  *  - `tags` is ARRAY<STRUCT<tag,value>> of the raw tag values (unparsed
  *    mode of `exon.sam_parse_tags`).
  */
object SamFormat extends LineFormat with IndexableGraftFormat {
  override def shortName: String = "sam"
  override def defaultExtensions: Seq[String] = Seq("sam")
  override def regionColumns: Option[(String, String, String)] =
    Some(("reference", "start", "end"))
  override val dataSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("flag", IntegerType, nullable = false),
    StructField("reference", StringType, nullable = true),
    StructField("start", LongType, nullable = true),
    StructField("end", LongType, nullable = true),
    StructField("mapping_quality", StringType, nullable = true),
    StructField("cigar", StringType, nullable = true),
    StructField("mate_reference", StringType, nullable = true),
    StructField("sequence", StringType, nullable = true),
    StructField("quality_score", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("value", StringType, nullable = true))), containsNull = false),
      nullable = true)))

  override def skipLine(line: String): Boolean = line.isEmpty || line.charAt(0) == '@'

  /** Reference bases consumed by a CIGAR string (M/D/N/=/X ops). */
  def cigarReferenceLength(cigar: String): Long = {
    var total = 0L
    var n = 0L
    var i = 0
    while (i < cigar.length) {
      val c = cigar.charAt(i)
      if (c >= '0' && c <= '9') n = n * 10 + (c - '0')
      else {
        c match {
          case 'M' | 'D' | 'N' | '=' | 'X' => total += n
          case _ => ()
        }
        n = 0
      }
      i += 1
    }
    total
  }

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    val f = line.split('\t')
    if (f.length < 11) return null
    val pos = java.lang.Long.parseLong(f(3))
    val unmapped = pos == 0L || f(5) == "*"
    required.map {
      case 0 => if (f(0) == "*") null else utf8(f(0))
      case 1 => Integer.parseInt(f(1))
      case 2 => if (f(2) == "*") null else utf8(f(2))
      case 3 => if (pos == 0L) null else pos
      case 4 => if (unmapped) null else pos + cigarReferenceLength(f(5)) - 1
      case 5 => if (f(4) == "255") null else utf8(f(4))
      case 6 => if (f(5) == "*") null else utf8(f(5))
      case 7 =>
        if (f(6) == "*") null
        else if (f(6) == "=") { if (f(2) == "*") null else utf8(f(2)) }
        else utf8(f(6))
      case 8 => if (f(9) == "*") null else utf8(f(9))
      case 9 =>
        if (f(10) == "*") null
        else {
          val q = f(10)
          val arr = new Array[Any](q.length)
          var i = 0
          while (i < q.length) { arr(i) = (q.charAt(i).toInt - 33).toLong; i += 1 }
          new GenericArrayData(arr)
        }
      case 10 =>
        val tags = new Array[Any](math.max(0, f.length - 11))
        var i = 11
        while (i < f.length) {
          tags(i - 11) = parseTag(f(i))
          i += 1
        }
        new GenericArrayData(tags)
    }
  }

  /** CIGAR reference length off a raw span (M/D/N/=/X ops). */
  private def cigarRefLenSpan(b: Array[Byte], off: Int, len: Int): Long = {
    var total = 0L
    var n = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i)
      if (c >= '0' && c <= '9') n = n * 10 + (c - '0')
      else {
        if (c == 'M' || c == 'D' || c == 'N' || c == '=' || c == 'X') total += n
        n = 0
      }
      i += 1
    }
    total
  }

  override def parsesBytes: Boolean = true
  override def skipLineBytes(b: Array[Byte], off: Int, len: Int): Boolean =
    len == 0 || b(off) == '@'
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
    if (nf < 11) return null
    @inline def star(i: Int): Boolean = spanEq(b, f.off(i), f.len(i), '*')
    val pos = parseLongSpan(b, f.off(3), f.len(3))
    val unmapped = pos == 0L || star(5)
    // while + @switch: required.map's Function1 dispatch is a measured
    // per-record tax (see the r17 VCF parse notes)
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      out(k) = (required(k): @scala.annotation.switch) match {
        case 0 => if (star(0)) null else utf8Span(b, f.off(0), f.len(0))
        case 1 => parseIntSpan(b, f.off(1), f.len(1))
        case 2 => if (star(2)) null else utf8Span(b, f.off(2), f.len(2))
        case 3 => if (pos == 0L) null else pos
        case 4 => if (unmapped) null
          else pos + cigarRefLenSpan(b, f.off(5), f.len(5)) - 1
        case 5 => if (f.len(4) == 3 && b(f.off(4)) == '2' && b(f.off(4) + 1) == '5' &&
            b(f.off(4) + 2) == '5') null
          else utf8Span(b, f.off(4), f.len(4))
        case 6 => if (star(5)) null else utf8Span(b, f.off(5), f.len(5))
        case 7 =>
          if (star(6)) null
          else if (spanEq(b, f.off(6), f.len(6), '=')) {
            if (star(2)) null else utf8Span(b, f.off(2), f.len(2))
          } else utf8Span(b, f.off(6), f.len(6))
        case 8 => if (star(9)) null else utf8Span(b, f.off(9), f.len(9))
        case 9 =>
          if (star(10)) null
          else {
            val qo = f.off(10)
            val ql = f.len(10)
            val arr = new Array[Any](ql)
            var i = 0
            while (i < ql) { arr(i) = (b(qo + i) - 33).toLong; i += 1 }
            new GenericArrayData(arr)
          }
        case 10 =>
          val tags = new Array[Any](math.max(0, nf - 11))
          var i = 11
          while (i < nf) {
            tags(i - 11) = parseTag(spanString(b, f.off(i), f.len(i)))
            i += 1
          }
          new GenericArrayData(tags)
      }
      k += 1
    }
    out
  }

  // ---- sink: schema-faithful text SAM ----------------------------------
  // The schema carries no PNEXT/TLEN (the reader drops them), so those
  // columns write as 0 — a read->write->read round trip is identity on
  // every schema column. Tag TYPE codes were also dropped at read; write
  // re-infers them (integer -> i, float -> f, numeric csv -> B:i/B:f,
  // else Z), htslib's best-fit convention for typeless tag text.

  override def fileHeader: Option[String] = Some("@HD\tVN:1.6\n")

  override def tabixPreset: (Int, Int, Int, Int) = (1, 3, 4, 0) // tabix -p sam

  private val intRe = "[-+]?\\d+".r
  private val floatRe = "[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?".r

  override def writeRecord(values: Array[Any], out: StringBuilder): Unit = {
    def star(v: Any): Unit = if (v == null) out.append('*') else out.append(v)
    star(values(0)); out.append('\t')              // QNAME
    out.append(values(1)).append('\t')             // FLAG
    star(values(2)); out.append('\t')              // RNAME
    if (values(3) == null) out.append('0') else out.append(values(3))
    out.append('\t')                               // POS
    if (values(5) == null) out.append("255") else out.append(values(5))
    out.append('\t')                               // MAPQ
    star(values(6)); out.append('\t')              // CIGAR
    values(7) match {                              // RNEXT ('=' when equal)
      case null => out.append('*')
      case m if values(2) != null && m.toString == values(2).toString =>
        out.append('=')
      case m => out.append(m)
    }
    out.append("\t0\t0\t")                         // PNEXT, TLEN: not in schema
    star(values(8)); out.append('\t')              // SEQ
    values(9) match {                              // QUAL (phred+33)
      case null => out.append('*')
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        var i = 0
        while (i < a.numElements()) {
          out.append((a.getLong(i) + 33).toChar); i += 1
        }
      case other => out.append(other)
    }
    values(10) match {
      case null => ()
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        var i = 0
        while (i < a.numElements()) {
          val t = a.getStruct(i, 2)
          val v = t.getUTF8String(1).toString
          out.append('\t').append(t.getUTF8String(0)).append(':')
          lazy val parts = v.split(',')
          if (v.indexOf(',') >= 0 &&
              parts.forall(e => intRe.matches(e) || floatRe.matches(e))) {
            val elem = if (parts.forall(intRe.matches(_))) 'i' else 'f'
            out.append("B:").append(elem).append(',').append(v)
          } else if (intRe.matches(v)) out.append("i:").append(v)
          else if (floatRe.matches(v)) out.append("f:").append(v)
          else out.append("Z:").append(v)
          i += 1
        }
      case _ => ()
    }
    out.append('\n')
  }

  override def recordRegion(values: Array[Any]): (String, Long, Long) = {
    if (values(2) == null || values(3) == null)
      throw new IllegalArgumentException(
        "bgzf+tabix SAM write cannot index unmapped records; filter them " +
          "out (flag & 4 = 0) or write with option(\"compression\",\"gzip\")")
    val start0 = values(3).asInstanceOf[Long] - 1
    val end0 = values(4) match {
      case null => start0 + 1
      case e => e.asInstanceOf[Long] // 1-based inclusive == 0-based exclusive
    }
    (String.valueOf(values(2)), start0, end0)
  }

  /** `TAG:TYPE:VALUE` → struct(tag, value-as-string); B-array values drop the
    * element-type prefix.
    */
  private def parseTag(raw: String): InternalRow = {
    val c1 = raw.indexOf(':')
    val c2 = raw.indexOf(':', c1 + 1)
    val tag = raw.substring(0, c1)
    val typ = raw.substring(c1 + 1, c2)
    var value = raw.substring(c2 + 1)
    if (typ == "B" && value.length > 1) value = value.substring(2) // strip elem type + comma
    new GenericInternalRow(Array[Any](utf8(tag), utf8(value)))
  }
}

/** VCF (text): fixed 8+ columns; id/alt/filter split into arrays, info and
  * formats kept as raw strings (the reference's default, typed structs behind
  * `vcf_parse_info/formats` are a later milestone). `formats` = the FORMAT
  * column plus all sample columns, tab-joined
  * (vcf-select-tests.slt:14-17 golden `GT:PL:PG\t0/0:0,3,26:0`).
  */
object VcfFormat extends LineFormat with IndexableGraftFormat {
  override def shortName: String = "vcf"
  override def defaultExtensions: Seq[String] = Seq("vcf")
  override def regionColumns: Option[(String, String, String)] =
    Some(("chrom", "pos", "pos"))
  override val dataSchema: StructType = StructType(Seq(
    StructField("chrom", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("id", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("ref", StringType, nullable = false),
    StructField("alt", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("qual", FloatType, nullable = true),
    StructField("filter", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("info", StringType, nullable = true),
    StructField("formats", StringType, nullable = true)))

  override def parseLine(line: String, required: Array[Int]): Array[Any] = {
    val f = line.split('\t')
    if (f.length < 8) return null
    required.map {
      case 0 => utf8(f(0))
      case 1 => java.lang.Long.parseLong(f(1))
      case 2 => if (f(2) == ".") null else utf8Array(f(2).split(';'))
      case 3 => utf8(f(3))
      case 4 => if (f(4) == ".") null else utf8Array(f(4).split(','))
      case 5 => dotNullFloat(f(5))
      case 6 => if (f(6) == ".") null else utf8Array(f(6).split(';'))
      case 7 => dotNull(f(7))
      case 8 =>
        if (f.length <= 8) null
        else utf8(f.drop(8).mkString("\t"))
    }
  }

  /** Byte-span parse: tab-split on the raw span (growable scratch — sample
    * column counts are unbounded); the `formats` column is the raw byte
    * range of fields 8..n-1 (identical to the tab re-join of the String
    * path, with zero intermediate Strings).
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
    // while + @switch instead of required.map{case ...}: the profiled VCF
    // decode spent ~30% of parse samples in the map's Function1 dispatch
    // (boxed index per FIELD per ROW) — same disease as the r16 columnar
    // setter fix, on the format side
    val out = new Array[Any](required.length)
    var k = 0
    while (k < required.length) {
      out(k) = (required(k): @scala.annotation.switch) match {
        case 0 => utf8Span(b, f.off(0), f.len(0))
        case 1 => parseLongSpan(b, f.off(1), f.len(1))
        case 2 => if (isDotSpan(b, f.off(2), f.len(2))) null
          else utf8ArraySpan(b, f.off(2), f.len(2), ';')
        case 3 => utf8Span(b, f.off(3), f.len(3))
        case 4 => if (isDotSpan(b, f.off(4), f.len(4))) null
          else utf8ArraySpan(b, f.off(4), f.len(4), ',')
        case 5 => dotNullFloatSpan(b, f.off(5), f.len(5))
        case 6 => if (isDotSpan(b, f.off(6), f.len(6))) null
          else utf8ArraySpan(b, f.off(6), f.len(6), ';')
        case 7 => dotNullSpan(b, f.off(7), f.len(7))
        case 8 =>
          if (nf <= 8) null
          else utf8Span(b, f.off(8), f.off(nf - 1) + f.len(nf - 1) - f.off(8))
      }
      k += 1
    }
    out
  }

  // ---- sink (the write-side of the tabix pruning shape) -----------------

  override def fileHeader: Option[String] = Some(
    "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")

  private def appendList(out: StringBuilder, v: Any, sep: Char): Unit = v match {
    case null => out.append('.')
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      var i = 0
      while (i < a.numElements()) {
        if (i > 0) out.append(sep)
        out.append(a.getUTF8String(i).toString)
        i += 1
      }
    case other => out.append(other)
  }

  override def writeRecord(values: Array[Any], out: StringBuilder): Unit = {
    out.append(values(0)).append('\t').append(values(1)).append('\t')
    appendList(out, values(2), ';')
    out.append('\t').append(values(3)).append('\t')
    appendList(out, values(4), ',')
    out.append('\t')
    values(5) match {
      case null => out.append('.')
      case q: java.lang.Float =>
        // integral quals print without the trailing .0 (round-trip: the
        // reader parses both forms to the same float)
        if (q.floatValue == q.intValue.toFloat) out.append(q.intValue)
        else out.append(q.floatValue)
      case other => out.append(other)
    }
    out.append('\t')
    appendList(out, values(6), ';')
    out.append('\t')
    if (values(7) == null) out.append('.') else out.append(values(7))
    if (values(8) != null) out.append('\t').append(values(8))
    out.append('\n')
  }

  override def recordRegion(values: Array[Any]): (String, Long, Long) = {
    // htslib's tabix VCF preset spans the whole REF allele
    // (end = POS + len(REF) - 1) and honors INFO END for symbolic
    // alleles/SVs — without this, an external tabix/htslib consumer of the
    // sink's .tbi misses deletions whose POS precedes a queried region but
    // whose span overlaps it. (Internal reads are pos-only and unaffected.)
    val pos = values(1).asInstanceOf[Long]
    val refLen = values(3) match {
      case null => 1L
      case r => math.max(1L, String.valueOf(r).length.toLong)
    }
    val infoEnd: Long = values(7) match {
      case null => -1L
      case info =>
        val s = String.valueOf(info)
        var i = s.indexOf("END=")
        var found = -1L
        while (i >= 0 && found < 0) {
          if (i == 0 || s.charAt(i - 1) == ';') { // not SVEND=/GENE_END=
            var j = i + 4
            var v = 0L
            var any = false
            while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
              v = v * 10 + (s.charAt(j) - '0'); j += 1; any = true
            }
            if (any && (j >= s.length || s.charAt(j) == ';')) found = v
          }
          i = s.indexOf("END=", i + 1)
        }
        found
    }
    val end1 = if (infoEnd >= pos) infoEnd else pos + refLen - 1
    (String.valueOf(values(0)), pos - 1, math.max(pos, end1))
  }
}
