package graft.sources.formats

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.sources._
import graft.sources.FormatUtil._

/** SAM reader with inferred typed tags — the `sam_parse_tags` mode of the
  * reference (exon/exon-sam/src/schema_builder.rs:75-252): `tags` becomes a
  * struct with one field per tag id seen in the file. Type mapping:
  * i/c/C/s/S -> INT, I -> BIGINT, f -> FLOAT, A/Z/H -> STRING,
  * B:f -> ARRAY<FLOAT>, other B -> ARRAY<BIGINT>.
  * Golden: tags."bb" = [0, 127, 255], tags."za" = 'Hello world!'
  * (sam-select-tests.slt:49-52).
  */
final class SamTypedFormat extends LineFormat {
  override def shortName: String = "sam"
  override def defaultExtensions: Seq[String] = Seq("sam")
  override val dataSchema: StructType = SamFormat.dataSchema
  override def regionColumns: Option[(String, String, String)] =
    Some(("reference", "start", "end"))
  override def skipLine(line: String): Boolean = line.isEmpty || line.charAt(0) == '@'

  private def tagType(typ: String): DataType = typ match {
    case "i" | "c" | "C" | "s" | "S" => IntegerType
    case "I" => LongType
    case "f" => FloatType
    case b if b.startsWith("B") => // value like "B" with elem in the payload
      ArrayType(LongType, containsNull = false)
    case _ => StringType
  }

  override def inferDataSchema(files: Seq[FileStatus],
                               open: FileStatus => java.io.InputStream): StructType = {
    require(files.nonEmpty, "sam: no files to infer tag schema from")
    val in = open(files.head)
    val fields = scala.collection.mutable.LinkedHashMap[String, DataType]()
    try {
      val lines = new ByteLineReader(in, 0L)
      var l = lines.readLine()
      while (l != null) {
        if (l.nonEmpty && l.charAt(0) != '@') {
          val f = l.split('\t')
          var i = 11
          while (i < f.length) {
            val parts = f(i).split(":", 3)
            if (parts.length == 3 && !fields.contains(parts(0))) {
              val dt =
                if (parts(1) == "B" && parts(2).startsWith("f"))
                  ArrayType(FloatType, containsNull = false)
                else tagType(parts(1))
              fields(parts(0)) = dt
            }
            i += 1
          }
        }
        l = lines.readLine()
      }
    } finally in.close()
    StructType(SamFormat.dataSchema.fields.map { f =>
      if (f.name == "tags")
        StructField("tags", StructType(
          fields.toSeq.map { case (n, t) => StructField(n, t, nullable = true) }),
          nullable = true)
      else f
    })
  }

  override def parseLine(line: String, required: Array[Int]): Array[Any] =
    throw new IllegalStateException("schema-aware path required")

  override def records(input: RecordInput, schema: StructType,
                       required: Array[Int]): Iterator[Array[Any]] = {
    val tagSchema = schema("tags").dataType match {
      case s: StructType => s
      case _ => StructType(Nil)
    }
    val base = new LineFormat {
      override def shortName = "sam"
      override def defaultExtensions: Seq[String] = Seq("sam")
      override val dataSchema: StructType = schema
      override def skipLine(line: String): Boolean =
        line.isEmpty || line.charAt(0) == '@'
      override def parseLine(line: String, req: Array[Int]): Array[Any] = {
        val f = line.split('\t')
        if (f.length < 11) return null
        // single tokenization: parse all required base columns in one call
        val baseIdx = req.filter(_ != 10)
        val baseVals = if (baseIdx.isEmpty) Array.empty[Any]
                       else SamFormat.parseLine(line, baseIdx)
        val byIdx = baseIdx.zip(baseVals).toMap
        req.map { i =>
          if (i != 10) byIdx(i)
          else {
            val kv = f.drop(11).iterator.map(_.split(":", 3))
              .filter(_.length == 3).map(p => p(0) -> (p(1), p(2))).toMap
            new GenericInternalRow(tagSchema.fields.map { field =>
              kv.get(field.name).map { case (_, raw) =>
                parseValue(field.dataType, raw)
              }.orNull
            }: Array[Any])
          }
        }
      }
    }
    base.records(input, required)
  }

  private def parseValue(dt: DataType, raw: String): Any = dt match {
    case IntegerType => Integer.valueOf(raw)
    case LongType => java.lang.Long.valueOf(raw)
    case FloatType => java.lang.Float.valueOf(raw)
    case ArrayType(FloatType, _) =>
      new GenericArrayData(raw.split(',').drop(1).map(v => java.lang.Float.valueOf(v): Any))
    case ArrayType(_, _) =>
      new GenericArrayData(raw.split(',').drop(1).map(v => java.lang.Long.valueOf(v): Any))
    case _ => utf8(raw)
  }
}
