package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row

/** Round-trip goldens per fasta-copy-tests.slt / fastq-copy-tests.slt. */
class WritersSpec extends AnyFunSuite with SharedSpark {
  private val fx = "/root/reference/exon/exon-core/test-data/datasources"

  test("fasta round trip, plain and gzip") {
    val dir = graft.TestTmp.dir("fasta_rt").toString
    val src = spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
    src.write.format("fasta").mode("overwrite").save(s"$dir/plain")
    val back = spark.read.format("fasta").load(s"$dir/plain").orderBy("id")
    assert(back.collect().toSeq == Seq(
      Row("a", "description", "ATCG"), Row("b", "description2", "ATCG")))

    src.write.format("fasta").mode("overwrite").option("compression", "gzip")
      .save(s"$dir/gz")
    val backGz = spark.read.format("fasta").load(s"$dir/gz").orderBy("id")
    assert(backGz.count() == 2)
    assert(backGz.head() == Row("a", "description", "ATCG"))
  }

  test("fastq round trip preserves quality strings") {
    val dir = graft.TestTmp.dir("fastq_rt").toString
    val src = spark.read.format("fastq").load(s"$fx/fastq/test.fastq")
    src.write.format("fastq").mode("overwrite").save(s"$dir/out")
    val back = spark.read.format("fastq").load(s"$dir/out").orderBy("name")
    val orig = src.orderBy("name").collect().toSeq
    assert(back.collect().toSeq == orig)
    // null description round-trips as null
    assert(back.collect()(1).isNullAt(1))
  }

  test("write then append accumulates records") {
    val dir = graft.TestTmp.dir("fasta_app").toString + "/t"
    val src = spark.read.format("fasta").load(s"$fx/fasta/test.fasta")
    src.write.format("fasta").mode("overwrite").save(dir)
    src.write.format("fasta").mode("append").save(dir)
    assert(spark.read.format("fasta").load(dir).count() == 4)
  }

  test("SQL sink: CREATE TABLE USING fasta + INSERT INTO / INSERT OVERWRITE") {
    // the Spark shape of the reference's COPY ... STORED AS FASTA
    val dir = graft.TestTmp.dir("fasta_sql_sink").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS fasta_sink")
    spark.sql(s"CREATE TABLE fasta_sink USING fasta LOCATION '$dir'")
    spark.sql(
      s"""INSERT INTO fasta_sink
         |SELECT id, description, sequence
         |FROM fasta_scan('$fx/fasta/test.fasta')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM fasta_sink").head().getLong(0) == 2)
    spark.sql(
      "INSERT INTO fasta_sink VALUES ('c', 'third', 'GGGG')")
    assert(spark.sql("SELECT count(*) FROM fasta_sink").head().getLong(0) == 3)
    // overwrite truncates via the TRUNCATE capability
    spark.sql(
      "INSERT OVERWRITE fasta_sink VALUES ('z', NULL, 'TTTT')")
    val rows = spark.sql("SELECT * FROM fasta_sink").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "z" && rows(0).isNullAt(1))
    spark.sql("DROP TABLE fasta_sink")
  }

  test("SQL copy-to-parquet: CTAS from a FASTA scan (parquet-copy-test.slt)") {
    // reference: COPY fasta_table TO '...' STORED AS PARQUET, then read it
    // back (exon-core/tests/sqllogictests/slt/parquet-copy-test.slt)
    val dir = graft.TestTmp.dir("fasta_parquet_copy").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS fasta_parquet_copy")
    spark.sql(
      s"""CREATE TABLE fasta_parquet_copy USING parquet LOCATION '$dir'
         |AS SELECT * FROM fasta_scan('$fx/fasta/test.fasta')""".stripMargin)
    val rows = spark.sql(
      "SELECT id, description, sequence FROM fasta_parquet_copy ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("a", "description", "ATCG"),
      ("b", "description2", "ATCG")))
    spark.sql("DROP TABLE fasta_parquet_copy")
  }
}
