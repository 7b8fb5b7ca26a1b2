package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}

/** The round-10 byte-span parsers (GFF/GTF/BED/SAM/VCF/HMMDOMTAB) must be
  * value-equivalent to the String parsers they replaced, on arbitrary
  * lines — including '.' markers, empty optional fields, trailing tabs,
  * non-ASCII UTF-8 in free-text fields, and negative/positive numbers.
  */
class ByteParseEquivalenceSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def norm(v: Any): String = v match {
    case null => "∅"
    case u: UTF8String => "s:" + u.toString
    case a: ArrayData =>
      "[" + (0 until a.numElements()).map { i =>
        if (a.isNullAt(i)) "∅"
        else norm(a.get(i, org.apache.spark.sql.types.StringType))
      }.mkString(",") + "]"
    case m: MapData =>
      val ks = m.keyArray(); val vs = m.valueArray()
      "{" + (0 until m.numElements()).map { i =>
        ks.getUTF8String(i).toString + "->" + normAny(vs, i)
      }.mkString(";") + "}"
    case other => other.getClass.getSimpleName + ":" + other.toString
  }

  // map values may be ARRAY<STRING> (GFF) or STRING (GTF)
  private def normAny(a: ArrayData, i: Int): String = {
    if (a.isNullAt(i)) return "∅"
    try norm(a.getUTF8String(i))
    catch { case _: Throwable => norm(a.getArray(i)) }
  }

  /** Both paths must agree on skip/drop/values — AND on rejection: if the
    * String parser throws (malformed shrunk input), the byte parser must
    * throw the same exception class.
    */
  private def sameParse(fmt: LineFormat, line: String, required: Array[Int]): Unit = {
    def outcome(f: => Array[Any]): Either[String, Seq[String]] =
      try {
        val r = f
        Right(if (r == null) null else r.map(norm).toSeq)
      } catch { case e: Exception => Left(e.getClass.getSimpleName) }
    val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val a = outcome(
      if (fmt.skipLine(line)) null else fmt.parseLine(line, required))
    val b = outcome(
      if (fmt.skipLineBytes(bytes, 0, bytes.length)) null
      else fmt.parseLineBytes(bytes, 0, bytes.length, required))
    assert(a == b, s"line=<$line> string=$a bytes=$b")
  }

  private val word = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '-', 'é', 'ß', '質')))
    .map(_.mkString.take(12))
  private val dotOr: Gen[String] = Gen.oneOf(Gen.const("."), word)
  private val num = Gen.chooseNum(0L, 500000000L).map(_.toString)

  test("parseLongSpan overflow fails loudly, matching Long.parseLong") {
    def spanOutcome(s: String): Either[String, Long] = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      try Right(FormatUtil.parseLongSpan(b, 0, b.length))
      catch { case e: Exception => Left(e.getClass.getSimpleName) }
    }
    def parseOutcome(s: String): Either[String, Long] =
      try Right(java.lang.Long.parseLong(s))
      catch { case e: Exception => Left(e.getClass.getSimpleName) }
    // beyond Long.MaxValue the byte path used to silently wrap; it must
    // throw NumberFormatException exactly like the String path
    val cases = Seq("9223372036854775807", "9223372036854775808",
      "92233720368547758070", "18446744073709551616", "99999999999999999999",
      "-9223372036854775807", "0", "1", "+42")
    cases.foreach { s =>
      assert(spanOutcome(s) == parseOutcome(s), s"diverged on $s")
    }
    // documented divergence: Long.MinValue's magnitude is unreachable via
    // the positive accumulator — out of range for every genomic field
    assert(spanOutcome("-9223372036854775808").isLeft)
  }

  test("GFF byte parse == String parse") {
    val attrs = Gen.oneOf(
      Gen.const("."),
      word.flatMap(k => word.map(v => s"$k=$v")),
      word.flatMap(k => word.map(v => s"$k=$v,$v;note=a%2Cb")))
    val gLine = for {
      sq <- word; src <- dotOr; ty <- word; st <- num; en <- num
      sc <- Gen.oneOf(".", "1.5", "-0.25", "3"); str <- Gen.oneOf("+", "-", ".")
      ph <- Gen.oneOf(".", "0", "1", "2"); at <- attrs
      trail <- Gen.oneOf("", "\t")
    } yield s"$sq\t$src\t$ty\t$st\t$en\t$sc\t$str\t$ph\t$at$trail"
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.GffFormat,
        line, Array(0, 1, 2, 3, 4, 5, 6, 7, 8))
      true
    })
  }

  test("GTF byte parse == String parse") {
    val attrs = Gen.oneOf(Gen.const("."),
      word.flatMap(k => word.map(v => s"""$k "$v";""")))
    val gLine = for {
      sq <- word; src <- dotOr; ty <- word; st <- num; en <- num
      sc <- Gen.oneOf(".", "2.75"); str <- Gen.oneOf("+", "-", ".")
      fr <- Gen.oneOf(".", "0"); at <- attrs
    } yield s"$sq\t$src\t$ty\t$st\t$en\t$sc\t$str\t$fr\t$at"
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.GtfFormat,
        line, Array(0, 1, 2, 3, 4, 5, 6, 7, 8))
      true
    })
  }

  test("BED byte parse == String parse") {
    val gLine = for {
      sq <- word; st <- num; en <- num
      nFields <- Gen.chooseNum(3, 12)
      rest <- Gen.listOfN(9, Gen.oneOf(Gen.const("."), word, num))
    } yield (Seq(sq, st, en) ++ rest.take(nFields - 3)).mkString("\t")
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.BedFormat, line, (0 until 12).toArray)
      true
    })
  }

  test("VCF byte parse == String parse") {
    // incl. trailing/leading/double separators — String.split's
    // trailing-empty-drop and interior-empty-keep semantics must match
    val list = Gen.oneOf(Gen.const("."), word,
      word.flatMap(a => word.map(b => s"$a;$b")),
      word.map(a => s"$a;"), word.map(a => s";$a"),
      word.map(a => s"$a;;$a"), Gen.const(";"), Gen.const(""))
    val alts = Gen.oneOf(Gen.const("."), Gen.const("A,G"), word,
      word.map(a => s"$a,"), Gen.const(",A"), Gen.const(","))
    val gLine = for {
      ch <- word; pos <- num; id <- list; ref <- Gen.oneOf("A", "CTT")
      alt <- alts; q <- Gen.oneOf(".", "50", "12.5"); fl <- list
      info <- Gen.oneOf(".", "AC=2;AF=0.5", "X=é")
      fmts <- Gen.oneOf("", "\tGT\t0/0", "\tGT:PL\t0/1:3\t1/1:7")
    } yield s"$ch\t$pos\t$id\t$ref\t$alt\t$q\t$fl\t$info$fmts"
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.VcfFormat,
        line, Array(0, 1, 2, 3, 4, 5, 6, 7, 8))
      true
    })
  }

  test("SAM byte parse == String parse") {
    val gLine = for {
      nm <- Gen.oneOf(Gen.const("*"), word); flag <- Gen.chooseNum(0, 4095)
      ref <- Gen.oneOf(Gen.const("*"), word); pos <- Gen.chooseNum(0L, 100000L)
      mq <- Gen.oneOf("255", "0", "60")
      cig <- Gen.oneOf("*", "10M", "5M2D3M", "4S6M")
      mref <- Gen.oneOf("*", "=", "chrX")
      seq <- Gen.oneOf(Gen.const("*"), Gen.const("ACGTACGT"))
      qual <- Gen.oneOf("*", "IIIIFFFF")
      tags <- Gen.oneOf("", "\tNM:i:2", "\tNM:i:2\tMD:Z:10")
    } yield s"$nm\t$flag\t$ref\t$pos\t$mq\t$cig\t$mref\t0\t0\t$seq\t$qual$tags"
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.SamFormat, line, (0 until 11).toArray)
      true
    })
  }

  test("HMMDOMTAB byte parse == String parse") {
    val fnum = Gen.oneOf("1.2e-30", "0.001", "256.1", "0.0")
    val gLine = for {
      tn <- word; ta <- dotOr; tl <- num; qn <- word; qa <- dotOr; ql <- num
      ev <- fnum; ss <- fnum; bi <- fnum; dn <- num; nd <- num
      ce <- fnum; ie <- fnum; ds <- fnum; db <- fnum
      h1 <- num; h2 <- num; a1 <- num; a2 <- num; e1 <- num; e2 <- num
      ac <- fnum
      desc <- Gen.oneOf("", " a description with spaces", " -")
      sep <- Gen.oneOf(" ", "  ", "\t", " \t ")
    } yield Seq(tn, ta, tl, qn, qa, ql, ev, ss, bi, dn, nd, ce, ie, ds, db,
      h1, h2, a1, a2, e1, e2, ac).mkString(sep) + desc
    check(Prop.forAll(gLine) { line =>
      sameParse(graft.sources.formats.HmmDomTabFormat, line, (0 until 23).toArray)
      true
    })
  }
}
