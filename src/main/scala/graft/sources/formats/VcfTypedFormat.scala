package graft.sources.formats

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** VCF reader with header-driven typed INFO/FORMAT structs — the
  * `vcf_parse_info` / `vcf_parse_formats` mode of the reference
  * (datasources/vcf/schema_builder.rs:199-265). Enabled per table with
  * `.option("parseInfo", true)` / `.option("parseFormats", true)`:
  *  - `info` becomes STRUCT<one field per ##INFO id> (Flag->BOOLEAN,
  *    Number=1 -> scalar, otherwise ARRAY of the base type),
  *  - `formats` becomes ARRAY<STRUCT<one field per ##FORMAT id>> with one
  *    struct per sample.
  * Absent keys are null; flags are true when present.
  */
final class VcfTypedFormat(parseInfo: Boolean, parseFormats: Boolean) extends GraftFormat {
  override def shortName: String = "vcf"
  override def defaultExtensions: Seq[String] = Seq("vcf")
  override val dataSchema: StructType = VcfFormat.dataSchema
  override def splittable: Boolean = true
  // header-derived schema is resolved at planning time; record parsing is
  // stateless per line, so index-free BGZF splits apply
  override def lineRecords: Boolean = true
  override def regionColumns: Option[(String, String, String)] =
    Some(("chrom", "pos", "pos"))

  private val DefRe = "##(INFO|FORMAT)=<ID=([^,>]+),Number=([^,>]+),Type=([^,>]+)".r

  private def fieldType(number: String, typ: String): DataType = {
    val base: DataType = typ match {
      case "Integer" => IntegerType
      case "Float" => FloatType
      case "Flag" => BooleanType
      case _ => StringType
    }
    number match {
      case "0" => BooleanType
      case "1" => base
      case _ => ArrayType(base, containsNull = true)
    }
  }

  /** Headers of EVERY file are read and merged (reference behavior:
    * per-header typed builder, vcf/schema_builder.rs:199-265): the merged
    * struct is the first-seen-ordered union of INFO/FORMAT ids. A key
    * declared with conflicting types across files fails loudly — silently
    * parsing file 2's data against file 1's types would mis-type values.
    * Keys absent from a given file simply stay null in its rows.
    */
  override def inferDataSchema(files: Seq[FileStatus],
                               open: FileStatus => java.io.InputStream): StructType = {
    require(files.nonEmpty, "vcf: no files to infer schema from")
    // Header reads are independent driver-side opens (an object-store
    // round-trip + gzip init each): do them in parallel, then merge
    // sequentially in file order so first-seen field ordering — and which
    // file a conflict is blamed on — stays deterministic.
    import scala.collection.parallel.CollectionConverters._
    val perFile: Seq[(String, Seq[(String, String, DataType)])] =
      files.par.map { file =>
        val defs = Seq.newBuilder[(String, String, DataType)]
        val in = open(file)
        try {
          val lines = new ByteLineReader(in, 0L)
          var l = lines.readLine()
          while (l != null && l.startsWith("#")) {
            DefRe.findFirstMatchIn(l).foreach { m =>
              defs += ((m.group(1), m.group(2), fieldType(m.group(3), m.group(4))))
            }
            l = if (l.startsWith("##")) lines.readLine() else null
          }
        } finally in.close()
        (file.getPath.toString, defs.result())
      }.seq.toSeq
    val info = scala.collection.mutable.LinkedHashMap.empty[String, (DataType, String)]
    val fmt = scala.collection.mutable.LinkedHashMap.empty[String, (DataType, String)]
    perFile.foreach { case (path, defs) =>
      defs.foreach { case (kind, id, dt) =>
        val target = if (kind == "INFO") info else fmt
        target.get(id) match {
          case Some((prev, firstPath)) if prev != dt =>
            throw new IllegalArgumentException(
              s"vcf: conflicting header types for $kind '$id': " +
                s"$prev in $firstPath vs $dt in $path — " +
                "split the read or align the headers")
          case Some(_) => ()
          case None => target(id) = (dt, path)
        }
      }
    }
    val infoFields = info.map { case (id, (dt, _)) =>
      StructField(id, dt, nullable = true) }.toSeq
    val formatFields = fmt.map { case (id, (dt, _)) =>
      StructField(id, dt, nullable = true) }.toSeq
    StructType(VcfFormat.dataSchema.fields.map { f =>
      f.name match {
        case "info" if parseInfo && infoFields.nonEmpty =>
          StructField("info", StructType(infoFields), nullable = true)
        case "formats" if parseFormats && formatFields.nonEmpty =>
          StructField("formats",
            ArrayType(StructType(formatFields), containsNull = false), nullable = true)
        case _ => f
      }
    })
  }

  private def parseScalar(dt: DataType, raw: String): Any = {
    if (raw == null || raw == "." || raw.isEmpty) return null
    dt match {
      case IntegerType => Integer.valueOf(raw)
      case FloatType => java.lang.Float.valueOf(raw)
      case BooleanType => java.lang.Boolean.TRUE
      case _ => utf8(raw)
    }
  }

  private def parseTyped(dt: DataType, raw: String): Any = dt match {
    case ArrayType(elem, _) =>
      if (raw == null || raw == ".") null
      else new GenericArrayData(raw.split(',').map(v => parseScalar(elem, v): Any))
    case BooleanType => if (raw == null) java.lang.Boolean.TRUE else java.lang.Boolean.TRUE
    case other => parseScalar(other, raw)
  }

  override def records(input: RecordInput, schema: StructType,
                       required: Array[Int]): Iterator[Array[Any]] = {
    val infoSchema = schema("info").dataType match {
      case s: StructType => s
      case _ => null
    }
    val fmtSchema = schema("formats").dataType match {
      case ArrayType(s: StructType, _) => s
      case _ => null
    }

    val base = new LineFormat {
      override def shortName = "vcf"
      override def defaultExtensions: Seq[String] = Seq("vcf")
      override val dataSchema: StructType = schema
      override def parseLine(line: String, req: Array[Int]): Array[Any] = {
        val f = line.split('\t')
        if (f.length < 8) return null
        req.map {
          case 0 => utf8(f(0))
          case 1 => java.lang.Long.parseLong(f(1))
          case 2 => if (f(2) == ".") null else utf8Array(f(2).split(';'))
          case 3 => utf8(f(3))
          case 4 => if (f(4) == ".") null else utf8Array(f(4).split(','))
          case 5 => dotNullFloat(f(5))
          case 6 => if (f(6) == ".") null else utf8Array(f(6).split(';'))
          case 7 =>
            if (infoSchema == null) dotNull(f(7))
            else parseInfoStruct(f(7), infoSchema)
          case 8 =>
            if (f.length <= 8) null
            else if (fmtSchema == null) utf8(f.drop(8).mkString("\t"))
            else parseFormatStructs(f, fmtSchema)
        }
      }

      /** Byte-span top-level parse: the whole line never materialises as
        * String — only the INFO field and the FORMAT/sample fields that
        * feed the typed struct parsers do (their per-type dispatch needs
        * Strings regardless).
        */
      override def parsesBytes: Boolean = true
      private val scratch = new ThreadLocal[FormatUtil.SpanFields] {
        override def initialValue(): FormatUtil.SpanFields =
          new FormatUtil.SpanFields(16)
      }
      override def parseLineBytes(b: Array[Byte], off: Int, len: Int,
                                  req: Array[Int]): Array[Any] =
        parseWith(scratch.get(), b, off, len, req)

      /** One ThreadLocal probe per CHUNK instead of per line (see
        * LineFormat.byteParser).
        */
      override protected def byteParser(req: Array[Int])
          : LineFormat.ByteLineParser = {
        val fl = scratch.get()
        new LineFormat.ByteLineParser {
          def parse(b: Array[Byte], off: Int, len: Int): Array[Any] =
            parseWith(fl, b, off, len, req)
        }
      }

      private def parseWith(fl: FormatUtil.SpanFields, b: Array[Byte],
                            off: Int, len: Int, req: Array[Int]): Array[Any] = {
        import FormatUtil._
        val nf = fl.split(b, off, len, '\t')
        if (nf < 8) return null
        // while + @switch: see the r17 VCF parse notes (required.map dispatch)
        val out = new Array[Any](req.length)
        var k = 0
        while (k < req.length) {
          out(k) = (req(k): @scala.annotation.switch) match {
            case 0 => utf8Span(b, fl.off(0), fl.len(0))
            case 1 => parseLongSpan(b, fl.off(1), fl.len(1))
            case 2 => if (isDotSpan(b, fl.off(2), fl.len(2))) null
              else utf8ArraySpan(b, fl.off(2), fl.len(2), ';')
            case 3 => utf8Span(b, fl.off(3), fl.len(3))
            case 4 => if (isDotSpan(b, fl.off(4), fl.len(4))) null
              else utf8ArraySpan(b, fl.off(4), fl.len(4), ',')
            case 5 => dotNullFloatSpan(b, fl.off(5), fl.len(5))
            case 6 => if (isDotSpan(b, fl.off(6), fl.len(6))) null
              else utf8ArraySpan(b, fl.off(6), fl.len(6), ';')
            case 7 =>
              if (infoSchema == null) dotNullSpan(b, fl.off(7), fl.len(7))
              else parseInfoStruct(spanString(b, fl.off(7), fl.len(7)), infoSchema)
            case 8 =>
              if (nf <= 8) null
              else if (fmtSchema == null)
                utf8Span(b, fl.off(8), fl.off(nf - 1) + fl.len(nf - 1) - fl.off(8))
              else {
                // FORMAT + samples as per-field Strings for the typed parse
                val tail = new Array[String](nf - 8)
                var i = 8
                while (i < nf) {
                  tail(i - 8) = spanString(b, fl.off(i), fl.len(i))
                  i += 1
                }
                parseFormatTail(tail, fmtSchema)
              }
          }
          k += 1
        }
        out
      }
    }
    base.records(input, required)
  }

  private def parseInfoStruct(raw: String, s: StructType): Any = {
    if (raw == null || raw == ".") return null
    val kv = raw.split(';').iterator.map { part =>
      val eq = part.indexOf('=')
      if (eq < 0) part -> null else part.substring(0, eq) -> part.substring(eq + 1)
    }.toMap
    new GenericInternalRow(s.fields.map { f =>
      if (!kv.contains(f.name)) {
        if (f.dataType == BooleanType) null else null
      } else parseTyped(f.dataType, kv(f.name))
    }: Array[Any])
  }

  private def parseFormatStructs(f: Array[String], s: StructType): Any =
    parseFormatTail(f.drop(8), s)

  /** tail(0) = FORMAT key list, tail(1..) = per-sample value lists. */
  private def parseFormatTail(tail: Array[String], s: StructType): Any = {
    if (tail.length <= 1) return null
    val keys = tail(0).split(':')
    val samples = (1 until tail.length).map { si =>
      val vals = tail(si).split(':')
      val kv = keys.zip(vals.padTo(keys.length, null)).toMap
      new GenericInternalRow(s.fields.map { field =>
        kv.get(field.name) match {
          case Some(v) => parseTyped(field.dataType, v)
          case None => null
        }
      }: Array[Any]): Any
    }
    new GenericArrayData(samples.toArray)
  }
}
