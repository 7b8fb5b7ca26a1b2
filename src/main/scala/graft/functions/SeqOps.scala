package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

/** One located regex match; 1-based start, end = start + match length
  * (i.e. 1-based end-exclusive), mirroring the reference goldens
  * (/root/reference/exon/exon-core/tests/sqllogictests/slt/sequence-udfs.slt:77-90).
  */
case class LocatedMatch(start: Int, end: Int, `match`: String)

/** Pure implementations of the domain scalar functions.
  *
  * Semantics are pinned by the reference's slt goldens, not its code:
  *  - reverse_complement: ACGT upper/lower complemented, all other chars pass
  *    through unchanged (reference udfs/sequence/reverse_complement.rs:39-55).
  *  - gc_content: count of uppercase 'G'/'C' over total length, Float32;
  *    NaN on empty input (udfs/sequence/gc_content.rs:60-66).
  *  - alignment_score: Smith-Waterman LOCAL alignment, match=+1 mismatch=-1,
  *    affine gap cost open + k*extend with open=-1 extend=-1
  *    (udfs/sequence/alignment_score.rs:98,114 — Aligner::new(-1,-1).local).
  *  - quality scores: Phred+33 (udfs/sequence/quality_score_string_to_list.rs:85).
  */
object SeqOps {

  def reverseComplement(seq: String): String = {
    val n = seq.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      out(n - 1 - i) = seq.charAt(i) match {
        case 'A' => 'T'; case 'a' => 't'
        case 'T' => 'A'; case 't' => 'a'
        case 'C' => 'G'; case 'c' => 'g'
        case 'G' => 'C'; case 'g' => 'c'
        case c   => c
      }
      i += 1
    }
    new String(out)
  }

  def gcContent(seq: String): Float = {
    var gc = 0
    var i = 0
    while (i < seq.length) {
      val c = seq.charAt(i)
      if (c == 'G' || c == 'C') gc += 1
      i += 1
    }
    gc.toFloat / seq.length.toFloat
  }

  def trimPolyA(seq: String): String = {
    var end = seq.length
    while (end > 0 && { val c = seq.charAt(end - 1); c == 'A' || c == 'a' }) end -= 1
    seq.substring(0, end)
  }

  def qualityScoresToList(quality: String): Array[Int] = {
    val out = new Array[Int](quality.length)
    var i = 0
    while (i < quality.length) { out(i) = quality.charAt(i).toInt - 33; i += 1 }
    out
  }

  def qualityScoresToString(scores: Seq[Int]): String = {
    val sb = new java.lang.StringBuilder(scores.length)
    scores.foreach(s => sb.append((s + 33).toChar))
    sb.toString
  }

  /** Index of each sequence char in `alphabet`, as Int16. Unknown chars are
    * an error (the reference builds an exact map and fails on miss).
    */
  def integerEncoding(seq: String, alphabet: String): Array[Short] = {
    val out = new Array[Short](seq.length)
    var i = 0
    while (i < seq.length) {
      val idx = alphabet.indexOf(seq.charAt(i))
      if (idx < 0)
        throw new IllegalArgumentException(
          s"integer_encoding: character '${seq.charAt(i)}' not in alphabet '$alphabet'")
      out(i) = idx.toShort
      i += 1
    }
    out
  }

  private val patternCache = new ConcurrentHashMap[String, Pattern]()

  def locateRegex(seq: String, pattern: String): Seq[LocatedMatch] = {
    // bounded: a per-row (non-literal) pattern column must not grow executor
    // memory without limit
    val p =
      if (patternCache.size < 1024) patternCache.computeIfAbsent(pattern, Pattern.compile(_))
      else {
        val cached = patternCache.get(pattern)
        if (cached != null) cached else Pattern.compile(pattern)
      }
    val m = p.matcher(seq)
    val out = Seq.newBuilder[LocatedMatch]
    while (m.find()) out += LocatedMatch(m.start + 1, m.end + 1, m.group)
    out.result()
  }

  /** Smith-Waterman local alignment score (Gotoh affine gaps). */
  def alignmentScore(x: String, y: String, gapOpen: Int = -1, gapExtend: Int = -1): Int = {
    val n = y.length
    val NEG = Int.MinValue / 2
    val h = new Array[Int](n + 1)
    val e = Array.fill(n + 1)(NEG)
    var best = 0
    var i = 1
    while (i <= x.length) {
      var f = NEG
      var hDiag = h(0)
      var j = 1
      while (j <= n) {
        e(j) = math.max(e(j) + gapExtend, h(j) + gapOpen + gapExtend)
        f = math.max(f + gapExtend, h(j - 1) + gapOpen + gapExtend)
        val sub = hDiag + (if (x.charAt(i - 1) == y.charAt(j - 1)) 1 else -1)
        hDiag = h(j)
        val sc = math.max(0, math.max(sub, math.max(e(j), f)))
        h(j) = sc
        if (sc > best) best = sc
        j += 1
      }
      i += 1
    }
    best
  }

  def containsPeak(mz: Seq[Double], target: Double, tolerance: Double): Boolean =
    mz.exists(v => math.abs(v - target) <= tolerance)

  /** Sum intensities into fixed-width bins over [binStart, binStart+n*width);
    * out-of-range mz values are skipped (reference udfs/massspec/bin_vectors.rs:155-190).
    */
  def binVectors(mz: Seq[Double], intensity: Seq[Double], binStart: Double,
                 numBins: Long, binWidth: Double): Array[Double] = {
    val bins = new Array[Double](numBins.toInt)
    val maxMz = binStart + numBins * binWidth
    val it1 = mz.iterator; val it2 = intensity.iterator
    while (it1.hasNext && it2.hasNext) {
      val m = it1.next(); val inten = it2.next()
      if (m >= binStart && m <= maxMz) {
        val b = ((m - binStart) / binWidth).toInt
        if (b < bins.length) bins(b) += inten
      }
    }
    bins
  }
}
