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

  test("default mode still yields raw strings") {
    val df = spark.read.format("vcf").load(vcf)
    assert(df.schema("info").dataType.typeName == "string")
  }
}
