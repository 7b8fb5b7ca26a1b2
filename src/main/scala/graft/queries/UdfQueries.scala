package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Domain scalar-function coverage, pinned by the reference's slt goldens
  * (/root/reference/exon/exon-core/tests/sqllogictests/slt/{sequence-udfs,
  * quality-score-udfs,vcf-udfs,mzml-functions}.slt).
  *
  * Each query evaluates the functions in Spark over literal VALUES tables;
  * the DuckDB oracle either recomputes the same predicate with plain SQL
  * (bit tests, range checks) or pins the expected output as typed literals.
  * The sfDir argument is ignored — these are engine-function tests, not data
  * tests.
  */
object UdfQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "u01_sequence_udfs" -> ((s, _) => s.sql(
      """SELECT s,
        |  reverse_complement(s) AS rc,
        |  trim_polya(s) AS tp,
        |  gc_content(s) AS gc,
        |  array_join(integer_encoding(s, 'ATCGatcg'), ',') AS enc,
        |  alignment_score(s, 'ATCG') AS score
        |FROM VALUES ('ATCG'), ('atcgaaaa'), ('AAA') t(s)
        |ORDER BY s""".stripMargin)),

    "u02_quality_scores" -> ((s, _) => s.sql(
      """SELECT
        |  array_join(quality_scores_to_list('###'), ',') AS l1,
        |  array_join(quality_scores_to_list('!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHI'), ',') AS l2,
        |  quality_scores_to_string(array(2, 2, 2)) AS s1,
        |  quality_scores_to_string(array(3, 2, 3)) AS s2""".stripMargin)),

    "u03_locate_regex" -> ((s, _) => s.sql(
      """SELECT
        |  to_json(locate_regex('agctggagctacc', 'agc')) AS m1,
        |  to_json(locate_regex('agctggagctacc', 'a[atcg]c')) AS m2,
        |  to_json(locate_regex('ATCG', 'A[TCG]C')) AS m3,
        |  to_json(locate_regex('AAA', 'A[TCG]C')) AS m4""".stripMargin)),

    "u04_samflags" -> ((s, _) => s.sql(
      """SELECT flag,
        |  is_segmented(flag) AS is_segmented,
        |  is_properly_aligned(flag) AS is_properly_aligned,
        |  is_properly_segmented(flag) AS is_properly_segmented,
        |  is_unmapped(flag) AS is_unmapped,
        |  is_mate_unmapped(flag) AS is_mate_unmapped,
        |  is_reverse_complemented(flag) AS is_reverse_complemented,
        |  is_mate_reverse_complemented(flag) AS is_mate_reverse_complemented,
        |  is_first_segment(flag) AS is_first_segment,
        |  is_last_segment(flag) AS is_last_segment,
        |  is_secondary(flag) AS is_secondary,
        |  is_qc_fail(flag) AS is_qc_fail,
        |  is_duplicate(flag) AS is_duplicate,
        |  is_supplementary(flag) AS is_supplementary
        |FROM VALUES (83), (163), (4), (73), (256), (512), (1024), (2048) t(flag)
        |ORDER BY flag""".stripMargin)),

    "u05_region_match" -> ((s, _) => s.sql(
      """SELECT chrom, positions,
        |  region_match(chrom, positions, '1:1-1') AS rm,
        |  interval_match(positions, '1-1') AS im,
        |  chrom_match(chrom, '1') AS cm
        |FROM VALUES ('1', 1), ('1', 1), ('1', 2), ('2', 2), ('2', 3) t(chrom, positions)
        |ORDER BY chrom, positions""".stripMargin)),

    "u06_region_filters" -> ((s, _) => s.sql(
      """SELECT chrom, pos, astart, aend,
        |  vcf_region_filter('chr1:10-20', chrom, pos) AS vrf,
        |  vcf_region_filter('chr1', chrom) AS vrf2,
        |  bam_region_filter('chr1:10-20', chrom, astart, aend) AS brf,
        |  cram_region_filter('chr1:10-20', chrom, astart, aend) AS crf,
        |  gff_region_filter('chr1', chrom, astart, aend) AS grf,
        |  bigwig_region_filter('chr1:12-13', chrom, astart, aend) AS bwrf
        |FROM VALUES ('chr1', 10L, 1L, 9L), ('chr1', 15L, 18L, 25L),
        |            ('chr1', 25L, 21L, 30L), ('chr2', 15L, 12L, 13L)
        |  t(chrom, pos, astart, aend)
        |ORDER BY chrom, pos, astart""".stripMargin)),

    "u07_massspec" -> ((s, _) => s.sql(
      """SELECT
        |  contains_peak(array(199.5D, 300.0D), 200.0D, 1.0D) AS p1,
        |  contains_peak(array(150.0D), 200.0D, 1.0D) AS p2,
        |  array_join(bin_vectors(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D), 1.0D, 3, 1.0D), ',') AS b1,
        |  array_join(bin_vectors(array(204.5D), array(203667.5D), 200.0D, 10, 1.0D), ',') AS b2""".stripMargin))
  )

  val oracles: Map[String, String] = Map(
    "u01_sequence_udfs" ->
      """SELECT * FROM (VALUES
        |  ('AAA', 'TTT', '', CAST(0.0 AS REAL), '0,0,0', 1),
        |  ('ATCG', 'CGAT', 'ATCG', CAST(0.5 AS REAL), '0,1,2,3', 4),
        |  ('atcgaaaa', 'ttttcgat', 'atcg', CAST(0.0 AS REAL), '4,5,6,7,4,4,4,4', 0)
        |) t(s, rc, tp, gc, enc, score)
        |ORDER BY s""".stripMargin,

    "u02_quality_scores" ->
      """SELECT
        |  '2,2,2' AS l1,
        |  '0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,25,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40' AS l2,
        |  '###' AS s1,
        |  '$#$' AS s2""".stripMargin,

    "u03_locate_regex" ->
      """SELECT
        |  '[{"start":1,"end":4,"match":"agc"},{"start":7,"end":10,"match":"agc"}]' AS m1,
        |  '[{"start":1,"end":4,"match":"agc"},{"start":7,"end":10,"match":"agc"},{"start":11,"end":14,"match":"acc"}]' AS m2,
        |  '[{"start":1,"end":4,"match":"ATC"}]' AS m3,
        |  '[]' AS m4""".stripMargin,

    "u04_samflags" ->
      """SELECT flag,
        |  (flag & 1) <> 0 AS is_segmented,
        |  (flag & 2) <> 0 AS is_properly_aligned,
        |  (flag & 2) <> 0 AS is_properly_segmented,
        |  (flag & 4) <> 0 AS is_unmapped,
        |  (flag & 8) <> 0 AS is_mate_unmapped,
        |  (flag & 16) <> 0 AS is_reverse_complemented,
        |  (flag & 32) <> 0 AS is_mate_reverse_complemented,
        |  (flag & 64) <> 0 AS is_first_segment,
        |  (flag & 128) <> 0 AS is_last_segment,
        |  (flag & 256) <> 0 AS is_secondary,
        |  (flag & 512) <> 0 AS is_qc_fail,
        |  (flag & 1024) <> 0 AS is_duplicate,
        |  (flag & 2048) <> 0 AS is_supplementary
        |FROM (VALUES (83), (163), (4), (73), (256), (512), (1024), (2048)) t(flag)
        |ORDER BY flag""".stripMargin,

    "u05_region_match" ->
      """SELECT chrom, positions,
        |  chrom = '1' AND positions BETWEEN 1 AND 1 AS rm,
        |  positions BETWEEN 1 AND 1 AS im,
        |  chrom = '1' AS cm
        |FROM (VALUES ('1', 1), ('1', 1), ('1', 2), ('2', 2), ('2', 3)) t(chrom, positions)
        |ORDER BY chrom, positions""".stripMargin,

    "u06_region_filters" ->
      """SELECT chrom, pos, astart, aend,
        |  chrom = 'chr1' AND pos BETWEEN 10 AND 20 AS vrf,
        |  chrom = 'chr1' AS vrf2,
        |  chrom = 'chr1' AND aend >= 10 AND astart <= 20 AS brf,
        |  chrom = 'chr1' AND aend >= 10 AND astart <= 20 AS crf,
        |  chrom = 'chr1' AS grf,
        |  chrom = 'chr1' AND aend >= 12 AND astart <= 12 AS bwrf
        |FROM (VALUES ('chr1', CAST(10 AS BIGINT), CAST(1 AS BIGINT), CAST(9 AS BIGINT)),
        |             ('chr1', 15, 18, 25), ('chr1', 25, 21, 30), ('chr2', 15, 12, 13))
        |  t(chrom, pos, astart, aend)
        |ORDER BY chrom, pos, astart""".stripMargin,

    "u07_massspec" ->
      """SELECT
        |  true AS p1,
        |  false AS p2,
        |  '1.0,2.0,3.0' AS b1,
        |  '0.0,0.0,0.0,0.0,203667.5,0.0,0.0,0.0,0.0,0.0' AS b2""".stripMargin
  )
}
