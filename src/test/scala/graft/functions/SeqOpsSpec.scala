package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel goldens from the reference slt corpus
  * (sequence-udfs.slt, quality-score-udfs.slt, mzml-functions.slt).
  */
class SeqOpsSpec extends AnyFunSuite {

  test("reverse_complement goldens") {
    assert(SeqOps.reverseComplement("ATCG") == "CGAT")
    assert(SeqOps.reverseComplement("atcg") == "cgat")
    assert(SeqOps.reverseComplement("AAA") == "TTT")
    assert(SeqOps.reverseComplement("") == "")
    // non-ACGT chars pass through (position-reversed)
    assert(SeqOps.reverseComplement("AN-C") == "G-NT")
  }

  test("gc_content counts uppercase G/C only") {
    assert(SeqOps.gcContent("ATCG") == 0.5f)
    assert(SeqOps.gcContent("GGCC") == 1.0f)
    assert(SeqOps.gcContent("atcg") == 0.0f)
    assert(SeqOps.gcContent("").isNaN)
  }

  test("trim_polya goldens") {
    assert(SeqOps.trimPolyA("ATCGAAAA") == "ATCG")
    assert(SeqOps.trimPolyA("atcgaaaa") == "atcg")
    assert(SeqOps.trimPolyA("AAAA") == "")
    assert(SeqOps.trimPolyA("ATCG") == "ATCG")
  }

  test("quality scores Phred+33 round trip") {
    assert(SeqOps.qualityScoresToList("###").toSeq == Seq(2, 2, 2))
    assert(SeqOps.qualityScoresToList("!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHI").toSeq
      == (0 to 40))
    assert(SeqOps.qualityScoresToString(Seq(2, 2, 2)) == "###")
    assert(SeqOps.qualityScoresToString(Seq(3, 2, 3)) == "$#$")
    assert(SeqOps.qualityScoresToString(2 to 40) == "#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHI")
  }

  test("integer_encoding goldens") {
    assert(SeqOps.integerEncoding("ATCG", "ATCG").toSeq == Seq[Short](0, 1, 2, 3))
    assert(SeqOps.integerEncoding("AAAA", "ATCG").toSeq == Seq[Short](0, 0, 0, 0))
    intercept[IllegalArgumentException](SeqOps.integerEncoding("ATCGX", "ATCG"))
  }

  test("locate_regex 1-based positions") {
    assert(SeqOps.locateRegex("agctggagctacc", "agc") ==
      Seq(LocatedMatch(1, 4, "agc"), LocatedMatch(7, 10, "agc")))
    assert(SeqOps.locateRegex("agctggagctacc", "a[atcg]c") ==
      Seq(LocatedMatch(1, 4, "agc"), LocatedMatch(7, 10, "agc"), LocatedMatch(11, 14, "acc")))
    assert(SeqOps.locateRegex("ATCG", "A[TCG]C") == Seq(LocatedMatch(1, 4, "ATC")))
    assert(SeqOps.locateRegex("AAA", "A[TCG]C") == Seq.empty)
  }

  test("alignment_score Smith-Waterman local, affine -1/-1") {
    assert(SeqOps.alignmentScore("ATCG", "ATCG") == 4)
    assert(SeqOps.alignmentScore("ATCG", "AG") == 1)
    assert(SeqOps.alignmentScore("ATCG", "ATCGG") == 4)
    assert(SeqOps.alignmentScore("AAA", "ATCG") == 1)
    assert(SeqOps.alignmentScore("", "ATCG") == 0)
    // gap worth taking: ACGT vs ACT -> AC + skip G + T = 3 matches + gap(-2) = 1?
    // local best is AC=2 vs ACxT with gap: 3 - 2 = 1; so 2.
    assert(SeqOps.alignmentScore("ACGT", "ACT") == 2)
    // long bridge: gap pays off. ACGTACGT vs ACGTCGT: 4 + (gap -2) + 3 = 5 > 4.
    assert(SeqOps.alignmentScore("ACGTACGT", "ACGTCGT") == 5)
  }

  test("contains_peak tolerance") {
    assert(SeqOps.containsPeak(Seq(199.5, 300.0), 200.0, 1.0))
    assert(!SeqOps.containsPeak(Seq(150.0), 200.0, 1.0))
    assert(SeqOps.containsPeak(Seq(201.0), 200.0, 1.0)) // inclusive bound
  }

  test("bin_vectors goldens") {
    assert(SeqOps.binVectors(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0), 1.0, 3, 1.0).toSeq
      == Seq(1.0, 2.0, 3.0))
    val b = SeqOps.binVectors(Seq(204.5), Seq(203667.40002441406), 200.0, 10, 1.0)
    assert(b.toSeq == Seq(0.0, 0.0, 0.0, 0.0, 203667.40002441406, 0.0, 0.0, 0.0, 0.0, 0.0))
    // out of range values skipped
    assert(SeqOps.binVectors(Seq(0.5, 99.0), Seq(5.0, 5.0), 1.0, 3, 1.0).toSeq
      == Seq(0.0, 0.0, 0.0))
  }

  test("genomic region parsing") {
    assert(GenomicRegion.parse("chr1") == GenomicRegion("chr1", None, None))
    assert(GenomicRegion.parse("chr1:100") == GenomicRegion("chr1", Some(100), None))
    assert(GenomicRegion.parse("chr1:100-200") == GenomicRegion("chr1", Some(100), Some(200)))
    assert(GenomicRegion.parse("1:1-1") == GenomicRegion("1", Some(1), Some(1)))
    assert(GenomicRegion.parseInterval("1-1") == ((1L, 1L)))
    assert(GenomicRegion.parseInterval("5") == ((5L, 5L)))
    val r = GenomicRegion.parse("chr1:10-20")
    assert(r.containsPos(10) && r.containsPos(20) && !r.containsPos(9) && !r.containsPos(21))
    assert(r.overlaps(18, 25) && !r.overlaps(1, 9) && !r.overlaps(21, 30))
  }
}
