package graft.sources.formats

import scala.collection.mutable
import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources._
import graft.sources.FormatUtil._

/** SDF (structure-data file): '$$$$'-delimited molecule records.
  * header = the first three non-empty lines joined; atom/bond counts from
  * the fixed-width counts line; `data` is a struct with one string field per
  * `> <name>` data item, inferred from the first record on the driver
  * (reference exon/exon-sdf/src/record.rs:103-190, schema_builder.rs:31-84;
  * golden count 6512, sdf-scan-tests.slt).
  */
object SdfFormat extends GraftFormat {
  override def shortName: String = "sdf"
  override def defaultExtensions: Seq[String] = Seq("sdf")

  /** Uncompressed multi-record SDF splits on the column-0 `$$$$` record
    * terminator (the multi-GB PubChem-dump landing shape): a record
    * belongs to the chunk owning its FIRST byte, and the owner reads past
    * its bound through the terminating `$$$$`. Unlike GenBank's LOCUS, a
    * record's first line (the molecule name) is arbitrary text, so a
    * mid-file chunk cannot tell from its first complete line whether it
    * landed at a record start or mid-record — it disambiguates by
    * LOOKING BACK: one positioned read of the bytes before the cut (the
    * raw stream's seek pointer is untouched by preads) checks whether the
    * last complete line before it is a `$$$$` terminator. Mid-record
    * tails are discarded through their terminator. Plain-gzip copies
    * stay one task (Codecs gate).
    */
  override def splittable: Boolean = true
  override val dataSchema: StructType = StructType(Seq(
    StructField("header", StringType, nullable = false),
    StructField("atom_count", IntegerType, nullable = true),
    StructField("bond_count", IntegerType, nullable = true),
    StructField("data", StructType(Nil), nullable = true)))

  private val DataHeaderRe = "<(.*?)>".r

  override def inferDataSchema(files: Seq[FileStatus],
                               open: FileStatus => java.io.InputStream): StructType = {
    require(files.nonEmpty, "sdf: no files to infer schema from")
    val in = open(files.head)
    val keys = try {
      val lines = new ByteLineReader(in, 0L)
      val rec = readRecordLines(lines)
      require(rec != null, s"sdf: empty file ${files.head.getPath}")
      parseDataItems(rec).map(_._1)
    } finally in.close()
    StructType(Seq(
      dataSchema.fields(0), dataSchema.fields(1), dataSchema.fields(2),
      StructField("data",
        StructType(keys.map(k => StructField(k, StringType, nullable = true))),
        nullable = true)))
  }

  /** Lines of one record (without the $$$$ terminator); null at EOF. */
  private def readRecordLines(lines: ByteLineReader): Array[String] = {
    val buf = mutable.ArrayBuffer[String]()
    var l = lines.readLine()
    if (l == null) return null
    while (l != null && l.trim != "$$$$") { buf += l; l = lines.readLine() }
    if (buf.forall(_.trim.isEmpty)) {
      if (l == null) null else readRecordLines(lines) // skip blank tail/gap
    } else buf.toArray
  }

  private def parseDataItems(rec: Array[String]): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (i < rec.length) {
      val line = rec(i)
      if (line.startsWith(">")) {
        DataHeaderRe.findFirstMatchIn(line) match {
          case Some(m) =>
            val key = m.group(1)
            val sb = new java.lang.StringBuilder()
            i += 1
            while (i < rec.length && rec(i).trim.nonEmpty) { sb.append(rec(i)); i += 1 }
            out += key -> sb.toString
          case None => ()
        }
      }
      i += 1
    }
    out.toSeq
  }

  override def records(input: RecordInput, schema: StructType,
                       required: Array[Int]): Iterator[Array[Any]] =
    new Iterator[Array[Any]] {
      private val dataFields = schema.fields(3).dataType.asInstanceOf[StructType].fieldNames
      private val lines = input.lines // mid-split: seek + partial-line discard

      /** True when the first complete line of this chunk starts a record —
        * i.e. the last complete line BEFORE it is a `$$$$` terminator,
        * read with one pread that leaves the sequential stream alone.
        */
      private def atRecordStart(): Boolean = {
        val p0 = lines.nextLineStart
        if (p0 <= 0) return true
        var n = math.min(80L, p0).toInt
        while (true) {
          val b = new Array[Byte](n)
          try input.stream.asInstanceOf[org.apache.hadoop.fs.FSDataInputStream]
            .readFully(p0 - n, b, 0, n)
          catch { case _: Exception => return false }
          var e = n
          if (e > 0 && b(e - 1) == '\n') e -= 1
          var s0 = e
          while (s0 > 0 && b(s0 - 1) != '\n') s0 -= 1
          // only judge a COMPLETE previous line: if the window holds no
          // '\n' and doesn't reach the file start, the line is longer than
          // the window — a whitespace+'$$$$' line TAIL must not be misread
          // as a terminator. Grow and re-read instead.
          if (s0 > 0 || n.toLong >= p0)
            return new String(b, s0, e - s0,
              java.nio.charset.StandardCharsets.UTF_8).trim == "$$$$"
          n = math.min(p0, n.toLong * 4).toInt
        }
        false
      }

      // mid-record landing: the record we cut belongs to the previous
      // chunk (it reads past its bound) — discard through its terminator
      if (input.isMidFileSplit && !atRecordStart()) {
        var l = lines.readLine()
        while (l != null && l.trim != "$$$$") l = lines.readLine()
      }

      /** Next record whose first byte this chunk owns, or null. */
      private def nextOwnedRecord(): Array[String] =
        if (lines.nextLineStart >= input.end) null
        else readRecordLines(lines)

      private var rec: Array[String] = nextOwnedRecord()

      override def hasNext: Boolean = rec != null

      override def next(): Array[Any] = {
        val r = rec
        rec = nextOwnedRecord()
        val out = required.map {
          case 0 =>
            utf8(r.take(3).iterator.map(_.trim).filter(_.nonEmpty).mkString("\n"))
          case 1 => countsAt(r, 0)
          case 2 => countsAt(r, 1)
          case 3 =>
            val items = parseDataItems(r).toMap
            new GenericInternalRow(
              dataFields.map(k => items.get(k).map(utf8(_): Any).orNull): Array[Any])
        }
        out
      }

      private def countsAt(r: Array[String], which: Int): Any = {
        if (r.length < 4) return null
        val line = r(3)
        val lo = which * 3; val hi = lo + 3
        if (line.length < hi) null
        else {
          val s = line.substring(lo, hi).trim
          try Integer.valueOf(s) catch { case _: NumberFormatException => null }
        }
      }
    }
}
