package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** sam_parse_tags goldens (sam-select-tests.slt:49-52). */
class SamTypedSpec extends AnyFunSuite with SharedSpark {
  private val sam = "/root/reference/exon/exon-core/test-data/datasources/sam/test.sam"

  test("typed tags struct: bb/za/RG golden") {
    val df = spark.read.format("sam").option("parseTags", "true").load(sam)
    val r = df.select(col("tags.bb"), col("tags.za"), col("tags.RG"),
      col("tags.fa"), col("tags.NM")).head()
    assert(r.getSeq[Long](0) == Seq(0L, 127L, 255L))
    assert(r.getString(1) == "Hello world!")
    assert(r.getString(2) == "grp1")
    assert(r.getFloat(3) == 3.14159f)
    assert(r.getInt(4) == 0)
  }

  test("base columns unchanged in typed mode") {
    val df = spark.read.format("sam").option("parseTags", "true").load(sam)
    val r = df.select("name", "flag", "start", "end").head()
    assert(r.getString(0) == "ref1_grp1_p001" && r.getInt(1) == 99)
    assert(r.getLong(2) == 1L && r.getLong(3) == 10L)
  }
}
