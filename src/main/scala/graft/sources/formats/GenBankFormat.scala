package graft.sources.formats

import scala.collection.mutable
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.sources._
import graft.sources.FormatUtil._

/** GenBank flat-file reader: '//'-terminated multi-record files. Schema per
  * the reference (exon/exon-genbank/src/config.rs:23-57): LOCUS-derived
  * scalars, free-text sections, and a features array of
  * (kind, location, qualifiers[(keys, values)]).
  */
object GenBankFormat extends GraftFormat {
  override def shortName: String = "genbank"
  override def defaultExtensions: Seq[String] = Seq("gb", "gbk", "genbank")

  /** Uncompressed multi-record GenBank splits at record boundaries: a
    * column-0 `LOCUS ` line is an unambiguous record start (every record
    * body line — sections, FEATURES, ORIGIN sequence — is indented, and
    * qualifier continuations indent 21 columns), so a mid-file chunk
    * aligns by scanning to the first validated LOCUS line it owns, and a
    * record belongs to the chunk owning its LOCUS line's first byte (the
    * owner reads past its bound through the terminating `//`). The
    * multi-GB flat-release landing shape fans out instead of one task.
    * Plain-gzip copies stay one task (Codecs gate), correct either way.
    */
  override def splittable: Boolean = true

  /** Record-start validation for split alignment: column-0 LOCUS keyword
    * followed by whitespace (tab-separated and short two-token LOCUS lines
    * are real-world variants; requiring `LOCUS <name> <len> ...` silently
    * dropped them in split mode while the whole-file '//'-grouping kept
    * them — split vs unsplit row counts must never diverge). Body lines are
    * indented, so a column-0 LOCUS keyword is unambiguous.
    */
  private def isRecordStart(l: String): Boolean =
    l.startsWith("LOCUS") &&
      (l.length == 5 || l.charAt(5) == ' ' || l.charAt(5) == '\t')

  /** trimmed-line == "//" without allocating the trim (every indented body
    * line would otherwise allocate a copy just for this comparison).
    */
  private def isRecordTerminator(l: String): Boolean = {
    var s = 0
    var e = l.length
    while (s < e && l.charAt(s) <= ' ') s += 1
    while (e > s && l.charAt(e - 1) <= ' ') e -= 1
    e - s == 2 && l.charAt(s) == '/' && l.charAt(s + 1) == '/'
  }

  private def isBlankLine(l: String): Boolean = {
    var s = 0
    val e = l.length
    while (s < e && l.charAt(s) <= ' ') s += 1
    s == e
  }

  // String.split("\\s+") recompiles the pattern on every call (the
  // single-char fast path doesn't apply) — precompile once.
  private val WS = java.util.regex.Pattern.compile("\\s+")

  private val qualifierType = ArrayType(StructType(Seq(
    StructField("keys", StringType, nullable = false),
    StructField("values", StringType, nullable = true))), containsNull = false)
  private val featureType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("qualifiers", qualifierType, nullable = true)))

  override val dataSchema: StructType = StructType(Seq(
    StructField("sequence", StringType, nullable = false),
    StructField("accession", StringType, nullable = true),
    StructField("comments", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("contig", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("dblink", StringType, nullable = true),
    StructField("definition", StringType, nullable = true),
    StructField("division", StringType, nullable = false),
    StructField("keywords", StringType, nullable = true),
    StructField("molecule_type", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("version", StringType, nullable = true),
    StructField("topology", StringType, nullable = false),
    StructField("features", ArrayType(featureType, containsNull = false), nullable = true)))

  override def records(input: RecordInput, required: Array[Int]): Iterator[Array[Any]] =
    new Iterator[Array[Any]] {
      // Split chunks group records LOCUS-to-'//' with byte ownership of the
      // LOCUS line; whole-file reads keep the tolerant everything-until-'//'
      // grouping (release-file preamble folds into record 1, where parse()
      // ignores unknown lines).
      private val split = input.isMidFileSplit || input.end != Long.MaxValue
      private val needSequence = required.contains(0)
      private val needFeatures = required.contains(14)
      private var rec: Array[String] = readRecord()

      /** Next record-start line whose first byte this chunk owns, or null.
        * Any line (LOCUS or not) starting at/after `end` means the rest of
        * the stream belongs to a later chunk — stop without reading on.
        */
      private def nextOwnedLocus(): String = {
        var l = input.lines.readLine()
        while (l != null && input.lines.lastLineStart < input.end &&
               !isRecordStart(l))
          l = input.lines.readLine()
        if (l == null || input.lines.lastLineStart >= input.end) null else l
      }

      private def readRecord(): Array[String] = {
        if (split) {
          val first = nextOwnedLocus()
          if (first == null) return null
          val buf = mutable.ArrayBuffer[String](first)
          var l = input.lines.readLine()
          while (l != null && !isRecordTerminator(l)) { buf += l; l = input.lines.readLine() }
          buf.toArray
        } else {
          val buf = mutable.ArrayBuffer[String]()
          var l = input.lines.readLine()
          while (l != null && !isRecordTerminator(l)) { buf += l; l = input.lines.readLine() }
          if (buf.isEmpty && l == null) null
          else if (buf.forall(isBlankLine)) { if (l == null) null else readRecord() }
          else buf.toArray
        }
      }

      override def hasNext: Boolean = rec != null

      override def next(): Array[Any] = {
        val r = parse(rec, needSequence, needFeatures)
        rec = readRecord()
        required.map(r(_))
      }
    }

  /** Parse one record's lines into values aligned with dataSchema. The two
    * expensive blocks — ORIGIN sequence assembly and the FEATURES
    * struct-array build — are skipped when their column is pruned (the
    * traversal is unchanged: their lines are indented, so skipping them
    * wholesale advances `i` exactly as the per-line `case _` fallthrough
    * would).
    */
  private def parse(lines: Array[String], needSequence: Boolean,
                    needFeatures: Boolean): Array[Any] = {
    var name: String = null; var moleculeType: String = null
    var topology: String = "linear"; var division: String = null; var date: String = null
    var accession: String = null; var version: String = null; var keywords: String = null
    var definition: String = null; var source: String = null; var dblink: String = null
    var contig: String = null
    val comments = mutable.ArrayBuffer[String]()
    val features = mutable.ArrayBuffer[Any]()
    val sequence = new java.lang.StringBuilder()

    // Section split: top-level keywords start at column 0.
    var i = 0
    def sectionBody(start: Int): (String, Int) = {
      // first line text after the keyword + continuation lines (indented)
      val first = lines(start).drop(12).trim
      val sb = new java.lang.StringBuilder(first)
      var j = start + 1
      while (j < lines.length && lines(j).startsWith(" ")) {
        sb.append(' ').append(lines(j).trim)
        j += 1
      }
      (sb.toString, j)
    }

    while (i < lines.length) {
      val line = lines(i)
      val kw = if (line.length >= 2 && !line.startsWith(" ")) {
        // token boundary = regex \s charset exactly ([ \t\n\f\r]):
        // Character.isWhitespace also matches Unicode space separators,
        // which would truncate an exotic column-0 token INTO a recognized
        // keyword where the old split("\\s+") let it fall through (r14
        // ADVICE parity nit)
        def isWs(c: Char): Boolean =
          c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
        var e = 0
        while (e < line.length && !isWs(line.charAt(e))) e += 1
        line.substring(0, e)
      } else ""
      kw match {
        case "LOCUS" =>
          val t = WS.split(line).drop(1)
          if (t.nonEmpty) name = t(0)
          // e.g. LOCUS name 38658 bp DNA linear CON 24-APR-2019
          val rest = t.drop(1)
          moleculeType = rest.find(x => x == "DNA" || x == "RNA" || x.contains("RNA")).orNull
          if (rest.contains("circular")) topology = "circular"
          val divIdx = rest.indexWhere(x => x == "linear" || x == "circular") + 1
          if (divIdx > 0 && divIdx < rest.length) division = rest(divIdx)
          date = rest.lastOption.filter(_.exists(_.isDigit)).orNull
          i += 1
        case "DEFINITION" => val (b, j) = sectionBody(i); definition = b; i = j
        case "ACCESSION" => val (b, j) = sectionBody(i); accession = b; i = j
        case "VERSION" => val (b, j) = sectionBody(i); version = b; i = j
        case "KEYWORDS" => val (b, j) = sectionBody(i); keywords = b; i = j
        case "DBLINK" => val (b, j) = sectionBody(i); dblink = b; i = j
        case "SOURCE" =>
          // SOURCE body includes the ORGANISM subsection; keep the first line.
          source = lines(i).drop(12).trim
          i += 1
          while (i < lines.length && lines(i).startsWith(" ")) i += 1
        case "COMMENT" => val (b, j) = sectionBody(i); comments += b; i = j
        case "CONTIG" => val (b, j) = sectionBody(i); contig = b; i = j
        case "FEATURES" =>
          i += 1
          if (!needFeatures) {
            while (i < lines.length && lines(i).startsWith(" ")) i += 1
          } else
          while (i < lines.length && lines(i).startsWith("     ") && lines(i).length > 5) {
            // feature header: 5 spaces, kind, location (may continue)
            val head = WS.split(lines(i).trim, 2)
            val kind = head(0)
            val loc = new java.lang.StringBuilder(if (head.length > 1) head(1) else "")
            i += 1
            while (i < lines.length && lines(i).startsWith("                     ") &&
              !lines(i).trim.startsWith("/")) {
              loc.append(lines(i).trim)
              i += 1
            }
            val quals = mutable.ArrayBuffer[Any]()
            while (i < lines.length && lines(i).startsWith("                     ")) {
              val q = lines(i).trim
              if (q.startsWith("/")) {
                val eq = q.indexOf('=')
                val key = if (eq < 0) q.substring(1) else q.substring(1, eq)
                val v0 = if (eq < 0) null else q.substring(eq + 1)
                val vb = new java.lang.StringBuilder(if (v0 == null) "" else v0)
                i += 1
                while (i < lines.length && lines(i).startsWith("                     ") &&
                  !lines(i).trim.startsWith("/")) {
                  vb.append(' ').append(lines(i).trim)
                  i += 1
                }
                val v = if (v0 == null) null
                        else vb.toString.stripPrefix("\"").stripSuffix("\"")
                quals += new GenericInternalRow(Array[Any](utf8(key),
                  if (v == null) null else utf8(v)))
              } else i += 1
            }
            features += new GenericInternalRow(Array[Any](
              utf8(kind), utf8(loc.toString), new GenericArrayData(quals.toArray)))
          }
        case "ORIGIN" =>
          i += 1
          while (i < lines.length && lines(i).startsWith(" ")) {
            if (needSequence) {
              // allocation-free rendering of the old
              // `trim -> indexOf(' ') -> substring.replace(" ", "")` chain,
              // char-exact: trimmed bounds, first SPACE ends the offset
              // token, everything after it appends minus spaces.
              val l = lines(i)
              var s = 0
              var e = l.length
              while (s < e && l.charAt(s) <= ' ') s += 1
              while (e > s && l.charAt(e - 1) <= ' ') e -= 1
              var sp = s
              while (sp < e && l.charAt(sp) != ' ') sp += 1
              if (sp < e) {
                var q = sp + 1
                while (q < e) {
                  val c = l.charAt(q)
                  if (c != ' ') sequence.append(c)
                  q += 1
                }
              }
            }
            i += 1
          }
        case _ => i += 1
      }
    }

    Array[Any](
      utf8(sequence.toString),
      dotNull(accession), {
        if (comments.isEmpty) null
        else new GenericArrayData(comments.map(utf8(_): Any).toArray)
      },
      dotNull(contig), dotNull(date), dotNull(dblink), dotNull(definition),
      dotNull(division), dotNull(keywords), dotNull(moleculeType), dotNull(name),
      dotNull(source), dotNull(version), utf8(topology),
      if (features.isEmpty) null else new GenericArrayData(features.toArray))
  }
}
