package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.Row

/** SQL-surface goldens: the functions as registered on a real session,
  * including the plan-time region rewrites (vcf-udfs.slt truth tables).
  */
class GraftFunctionsSpec extends AnyFunSuite with SharedSpark {

  test("sequence UDFs via SQL") {
    val r = spark.sql(
      "SELECT reverse_complement('ATCG'), reverse_complement('atcg'), " +
        "trim_polya('ATCGAAAA'), length(trim_polya('AAAA')), " +
        "alignment_score('ATCG', 'ATCG'), alignment_score('ATCG', 'AG'), " +
        "alignment_score('ATCG', 'ATCGG'), gc_content('ATCG')").head()
    assert(r == Row("CGAT", "cgat", "ATCG", 0, 4, 1, 4, 0.5f))
  }

  test("quality score UDFs via SQL") {
    val r = spark.sql(
      "SELECT quality_scores_to_list('###'), quality_scores_to_string(array(3, 2, 3))").head()
    assert(r.getSeq[Int](0) == Seq(2, 2, 2))
    assert(r.getString(1) == "$#$")
  }

  test("locate_regex struct output via SQL") {
    val r = spark.sql("SELECT locate_regex('agctggagctacc', 'agc')").head()
    assert(r.getSeq[Row](0) == Seq(Row(1, 4, "agc"), Row(7, 10, "agc")))
  }

  test("region_match truth table (vcf-udfs.slt)") {
    val rows = spark.sql(
      """SELECT region_match(chrom, positions, '1:1-1'),
        |       interval_match(positions, '1-1'),
        |       chrom_match(chrom, '1')
        |FROM VALUES ('1',1),('1',1),('1',2),('2',2),('2',3) t(chrom, positions)""".stripMargin)
      .collect().toSeq
    assert(rows.map(_.getBoolean(0)) == Seq(true, true, false, false, false))
    assert(rows.map(_.getBoolean(1)) == Seq(true, true, false, false, false))
    assert(rows.map(_.getBoolean(2)) == Seq(true, true, true, false, false))
  }

  test("region functions arity errors raise") {
    intercept[Throwable](spark.sql("SELECT region_match('a', 'b')").collect())
    intercept[Throwable](spark.sql("SELECT interval_match(1)").collect())
    intercept[Throwable](spark.sql("SELECT chrom_match('a')").collect())
  }

  test("sam flag predicates") {
    // flag 83 = 0x53: segmented, properly aligned, reverse complemented, first
    val r = spark.sql(
      "SELECT is_segmented(83), is_properly_aligned(83), is_unmapped(83), " +
        "is_reverse_complemented(83), is_first_segment(83), is_last_segment(83), " +
        "is_duplicate(1024), is_supplementary(2048), is_secondary(256), is_qc_fail(512)").head()
    assert(r == Row(true, true, false, true, true, false, true, true, true, true))
  }

  test("region filters rewrite to pushable conjuncts") {
    // The rewrite must produce plain comparisons that reach the parquet scan
    // as PushedFilters, not a UDF black box.
    val df = spark.sql(
      """SELECT * FROM VALUES ('chr1', 15L) t(chrom, pos)
        |WHERE vcf_region_filter('chr1:10-20', chrom, pos)""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"region filter left a UDF in plan:\n$plan")
    assert(df.count() == 1)
    // overlap family semantics at the SQL surface
    val overlaps = spark.sql(
      """SELECT bam_region_filter('chr1:10-20', chrom, s, e)
        |FROM VALUES ('chr1', 1L, 9L), ('chr1', 18L, 25L), ('chr2', 18L, 25L) t(chrom, s, e)""".stripMargin)
      .collect().toSeq.map(_.getBoolean(0))
    assert(overlaps == Seq(false, true, false))
  }

  test("native expressions: no ScalaUDF in the plan, codegen-compatible") {
    val df = spark.sql(
      "SELECT gc_content(sequence) g, reverse_complement(sequence) rc, " +
        "quality_scores_to_list(sequence) q " +
        "FROM VALUES ('ATCG'), ('GGCC') t(sequence)")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.collect().length == 2)
  }

  test("mass spec UDFs") {
    val r = spark.sql(
      "SELECT contains_peak(array(199.5D), 200.0D, 1.0D), " +
        "bin_vectors(array(1.0D,2.0D,3.0D), array(1.0D,2.0D,3.0D), 1.0D, 3, 1.0D)").head()
    assert(r.getBoolean(0))
    assert(r.getSeq[Double](1) == Seq(1.0, 2.0, 3.0))
  }

  test("null propagation") {
    val r = spark.sql(
      "SELECT reverse_complement(CAST(NULL AS STRING)), gc_content(CAST(NULL AS STRING)), " +
        "alignment_score(CAST(NULL AS STRING), 'A')").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("implicit casts + non-ASCII safety for native expressions") {
    graft.GraftSession.registerAll(spark)
    // SQL double-array literal implicitly casts to the float-array input
    val c = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
    // multi-byte characters pass through un-shredded (char semantics)
    val rc = spark.sql("SELECT reverse_complement('A\u00e9T') AS rc").head().getString(0)
    assert(rc == "A\u00e9T".reverse.map {
      case 'A' => 'T'; case 'T' => 'A'; case c2 => c2
    }.mkString)
    val gc = spark.sql("SELECT gc_content('GC\u00e9') AS gc").head().getFloat(0)
    assert(math.abs(gc - 2.0f / 3.0f) < 1e-6, s"gc=$gc (chars, not bytes)")
  }

  test("dot_long: codegen'd integer dot product, int casts, negative values") {
    graft.GraftSession.registerAll(spark)
    val d = spark.sql(
      "SELECT dot_long(array(2L, -3L, 5L), array(7L, 11L, -13L)) AS d")
      .head().getLong(0)
    assert(d == 2L * 7 - 3 * 11 - 5 * 13)
    // int arrays implicitly cast to bigint arrays
    val d2 = spark.sql("SELECT dot_long(array(1, 2), array(3, 4)) AS d")
      .head().getLong(0)
    assert(d2 == 11L)
    // matches the zip_with + aggregate formulation it replaced
    val both = spark.sql(
      """SELECT dot_long(a, b) AS fast,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS slow
        |FROM (SELECT array(12L, -7L, 9L, 0L) a, array(3L, 4L, -2L, 8L) b)""".stripMargin)
      .head()
    assert(both.getLong(0) == both.getLong(1))
  }
}
