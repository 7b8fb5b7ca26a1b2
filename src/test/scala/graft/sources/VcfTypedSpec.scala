package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Typed INFO/FORMAT goldens (vcf-select-tests.slt parse mode). */
class VcfTypedSpec extends AnyFunSuite with SharedSpark {
  private val vcf = "/root/reference/exon/exon-core/test-data/datasources/vcf/index.vcf"

  test("parseInfo: typed struct fields match the slt golden") {
    val df = spark.read.format("vcf")
      .option("parseInfo", "true").option("parseFormats", "true").load(vcf)
    val r = df.select(col("info.DP"), col("info.MQ0F"), col("info.I16"),
      col("info.QS"), col("info.INDEL")).head()
    assert(r.getInt(0) == 1)
    assert(r.getFloat(1) == 0.0f)
    assert(r.getSeq[Float](2).take(6) == Seq(1.0f, 0.0f, 0.0f, 0.0f, 26.0f, 676.0f))
    assert(r.getSeq[Float](3) == Seq(1.0f, 0.0f))
    assert(r.isNullAt(4)) // INDEL flag absent -> null
  }

  test("parseFormats: per-sample structs (GT 0/0, PL [0,3,26], PG 0)") {
    val df = spark.read.format("vcf")
      .option("parseFormats", "true").load(vcf)
    val fmts = df.select(col("formats")).head().getSeq[Row](0)
    assert(fmts.length == 1)
    val s = fmts.head
    val schema = df.schema("formats").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(s.getString(schema.fieldIndex("GT")) == "0/0")
    assert(s.getSeq[Int](schema.fieldIndex("PL")) == Seq(0, 3, 26))
    // count unchanged by typed parsing
    assert(df.count() == 621)
  }

  private def writeVcf(dir: java.nio.file.Path, name: String, headers: Seq[String],
                       rows: Seq[String]): Unit = {
    val body = (Seq("##fileformat=VCFv4.2") ++ headers ++
      Seq("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1") ++ rows)
      .mkString("", "\n", "\n")
    java.nio.file.Files.writeString(dir.resolve(name), body)
  }

  test("directory inference merges compatible headers across files") {
    val dir = graft.TestTmp.dir("graft_vcf_merge")
    writeVcf(dir, "a.vcf",
      Seq("""##INFO=<ID=DP,Number=1,Type=Integer,Description="d">"""),
      Seq("1\t10\t.\tA\tC\t.\t.\tDP=7\tGT\t0/0"))
    writeVcf(dir, "b.vcf",
      Seq("""##INFO=<ID=DP,Number=1,Type=Integer,Description="d">""",
        """##INFO=<ID=AF,Number=1,Type=Float,Description="f">"""),
      Seq("1\t20\t.\tA\tG\t.\t.\tDP=9;AF=0.5\tGT\t0/1"))
    val df = spark.read.format("vcf").option("parseInfo", "true").load(dir.toString)
    val rows = df.select(col("pos"), col("info.DP"), col("info.AF"))
      .orderBy("pos").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 7 && rows(0).isNullAt(2),
      "field absent from a file's header stays null in its rows")
    assert(rows(1).getInt(1) == 9 && rows(1).getFloat(2) == 0.5f)
  }

  test("directory inference fails loudly on conflicting header types") {
    val dir = graft.TestTmp.dir("graft_vcf_conflict")
    writeVcf(dir, "a.vcf",
      Seq("""##INFO=<ID=DP,Number=1,Type=Integer,Description="d">"""),
      Seq("1\t10\t.\tA\tC\t.\t.\tDP=7\tGT\t0/0"))
    writeVcf(dir, "b.vcf",
      Seq("""##INFO=<ID=DP,Number=1,Type=Float,Description="d">"""),
      Seq("1\t20\t.\tA\tG\t.\t.\tDP=9.5\tGT\t0/1"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("vcf").option("parseInfo", "true").load(dir.toString).schema
    }
    assert(e.getMessage.contains("conflicting header types") &&
      e.getMessage.contains("DP"))
  }

  test("default mode still yields raw strings") {
    val df = spark.read.format("vcf").load(vcf)
    assert(df.schema("info").dataType.typeName == "string")
  }
}
