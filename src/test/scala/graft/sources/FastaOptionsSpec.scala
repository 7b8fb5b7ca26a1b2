package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class FastaOptionsSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("integer-encoded DNA sequences (A,C,G,T,N -> 1..5)") {
    val df = spark.read.format("fasta")
      .option("sequenceDataType", "integer_encode_dna")
      .load(s"$fx/fasta/test.fasta").orderBy("id")
    val r = df.head()
    assert(r.getSeq[Byte](2) == Seq[Byte](1, 4, 2, 3)) // ATCG
    assert(df.schema("sequence").dataType.simpleString == "array<tinyint>")
  }

  test("alignment_score 3-arg gap_open override") {
    graft.GraftSession.registerAll(spark)
    val r = spark.sql(
      "SELECT alignment_score('ATCG','ATCG'), alignment_score('ACGTACGT','ACGTCGT', -1), " +
        "alignment_score('ACGTACGT','ACGTCGT', -10)").head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 5)   // gap worth taking at open=-1
    assert(r.getInt(2) == 4)   // heavy open cost: no gap, best local run = 4
    intercept[Throwable](spark.sql("SELECT alignment_score('A','T','hi')").collect())
  }
}
