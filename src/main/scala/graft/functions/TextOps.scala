package graft.functions

import scala.util.hashing.MurmurHash3

/** Text-analysis kernels for the training-data pipeline pack: language ID,
  * quality scoring, SimHash, MinHash, and winnowing fingerprints. All are
  * deterministic (fixed seeds) so results are reproducible across runs and
  * cluster sizes.
  */
object TextOps {

  // Small per-language stopword lists for the n-gram-free language heuristic.
  // Priority order (ties): en > de > fr > es.
  private val stopwords: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Set("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Set("el", "los", "y", "una", "es", "por", "con"))

  def words(text: String): Array[String] = text.split(" ", -1)

  /** Distinct word n-gram shingles ('_'-joined). Matches the SQL definition
    * `list_distinct([w[i] || '_' || ... for i in 1..len(w)-n+1])`.
    */
  def wordShingles(text: String, n: Int): Array[String] = {
    val ws = words(text)
    if (ws.length < n) return Array.empty
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { if (j > 0) sb.append('_'); sb.append(ws(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** Distinct n-grams of an ALREADY-TOKENIZED sequence, space-joined —
    * the [[wordShingles]] hot loop (while + LinkedHashSet +
    * StringBuilder) without the per-window Seq allocation that
    * scala's sliding() pays (one 13-element Seq + mkString per
    * position). Space separator matches the sliding/mkString shape it
    * replaces (l54's token grams); tokens never contain spaces (they
    * come from space-split words), so equality is unchanged.
    */
  def tokenShingles(tk: Array[String], n: Int): Array[String] = {
    if (tk.length < n) return Array.empty
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= tk.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(tk(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** Stopword-vote language ID; 'und' when no list scores a hit. */
  def langId(text: String): String = {
    val ws = words(text)
    var bestLang = "und"
    var bestHits = 0
    stopwords.foreach { case (lang, set) =>
      var hits = 0
      var i = 0
      while (i < ws.length) { if (set.contains(ws(i))) hits += 1; i += 1 }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }
    bestLang
  }

  private val allStopwordSet: Set[String] = stopwords.flatMap(_._2).toSet

  /** Fraction of words that are (any-language) stopwords, 4-decimal rounded. */
  def stopwordRatio(text: String): Double = {
    val ws = words(text)
    if (ws.isEmpty) return 0.0
    val hits = ws.count(allStopwordSet.contains)
    math.floor(hits.toDouble / ws.length * 10000 + 0.5) / 10000
  }

  /** Heuristic quality in [0,1]: mean of (bounded mean word length score,
    * stopword presence score, length score). Deterministic and cheap — the
    * shape of a real quality model, not a claim to be one.
    */
  def qualityScore(text: String): Double = {
    val ws = words(text)
    if (ws.isEmpty) return 0.0
    val meanLen = ws.iterator.map(_.length).sum.toDouble / ws.length
    val lenScore = math.min(1.0, ws.length / 100.0)
    val wordScore = math.min(1.0, meanLen / 5.0)
    val stopScore = math.min(1.0, 5.0 * ws.count(allStopwordSet.contains) / ws.length)
    math.floor((lenScore + wordScore + stopScore) / 3.0 * 10000 + 0.5) / 10000
  }

  /** 64-bit SimHash over word tokens (FNV-1a word hashes, sign-vote bits). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    words(text).foreach { w =>
      var h = 0xcbf29ce484222325L // FNV-1a
      var i = 0
      while (i < w.length) { h ^= w.charAt(i); h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Manku-style multi-block SimHash keys (Detecting Near-Duplicates for
    * Web Crawling, WWW'07 §3): split the 64-bit fingerprint into 8 blocks
    * of 8 bits; a pair within hamming distance 6 differs in at most 6
    * blocks, so at least 2 blocks are bit-identical — some block PAIR
    * matches exactly (pigeonhole). Emit all C(8,2)=28 block-pair keys
    * (16 bits each). vs the naive 7-single-chunk banding (9-bit keys,
    * 512 buckets): candidate density falls from 7/2^9 to 28/2^16 — 32x
    * fewer random collisions — at 4x the emitted rows. More blocks (b=9,
    * t=3; b=10, t=4) widen keys further at C(b,t) row expansion; b=8 is
    * the knee for corpora up to ~10^8 docs.
    */
  def simhashBlockKeys(sh: Long): Array[Int] = {
    val blocks = Array.tabulate(8)(i => ((sh >>> (i * 8)) & 0xffL).toInt)
    val out = new Array[Int](28)
    var n = 0
    var i = 0
    while (i < 8) {
      var j = i + 1
      while (j < 8) {
        out(n) = (blocks(i) << 8) | blocks(j)
        n += 1
        j += 1
      }
      i += 1
    }
    out
  }

  // ---- MinHash ----

  val NumHashes = 64
  // 32 bands x 2 rows: candidate recall at the query pack's j>=0.5
  // threshold is 1 - 0.75^32 (~0.9999) and ~1-6e-15 at j=0.8 — banding
  // width is chosen so the exact-Jaccard verification step, not band luck,
  // decides the output.
  val NumBands = 32

  private val (hashA, hashB) = {
    val rnd = new java.util.Random(42)
    val a = Array.fill(NumHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(NumHashes)(rnd.nextLong())
    (a, b)
  }

  /** Fold ONE shingle into a 64-perm signature buffer in place — the
    * native `minhash_agg` aggregate's update step; identical math to
    * [[minhashSignature]], so the two paths produce equal signatures
    * (duplicate shingles are absorbed by min, so raw postings need no
    * distinct before aggregating).
    */
  def minhashUpdateInPlace(buf: Array[Long], s: String): Unit = {
    val h = MurmurHash3.stringHash(s).toLong & 0xffffffffL
    var i = 0
    while (i < NumHashes) {
      val v = (hashA(i) * h + hashB(i)) >>> 1
      if (v < buf(i)) buf(i) = v
      i += 1
    }
  }

  /** 64 minhash values over a shingle set (murmur3 base hash, fixed-seed
    * universal rehashes).
    */
  def minhashSignature(shingles: Seq[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val h = MurmurHash3.stringHash(s).toLong & 0xffffffffL
      var i = 0
      while (i < NumHashes) {
        val v = (hashA(i) * h + hashB(i)) >>> 1 // keep non-negative
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Band signatures for LSH bucketing: one hash per NumBands-row band. */
  def minhashBands(shingles: Seq[String]): Array[Long] = {
    val sig = minhashSignature(shingles)
    val rows = NumHashes / NumBands
    Array.tabulate(NumBands) { b =>
      var h = 1125899906842597L
      var i = b * rows
      while (i < (b + 1) * rows) { h = 31 * h + sig(i); i += 1 }
      h
    }
  }

  /** Winnowing document fingerprint: char 8-gram rolling hashes, window 4,
    * XOR of the selected minima — a single stable BIGINT per document.
    */
  def winnowFingerprint(text: String): Long = {
    val k = 8
    val w = 4
    // below k+w-1 chars the window loop never runs (fingerprint would be a
    // constant 0); fall back to simhash like the sub-k case
    if (text.length < k + w - 1) return simhash64(text)
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L // FNV-1a 64-bit offset basis
      var j = 0
      while (j < k) { h ^= text.charAt(i + j); h *= 1099511628211L; j += 1 }
      hs(i) = h
      i += 1
    }
    var out = 0L
    var prevMinIdx = -1
    i = 0
    while (i + w <= n) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      if (minIdx != prevMinIdx) { out ^= hs(minIdx); prevMinIdx = minIdx }
      i += 1
    }
    out
  }

  /** Word-2-gram repetition profile, the Gopher-style repetition quality
    * signals: (total 2-grams, duplicate occurrences = total - distinct,
    * occurrences of the most frequent 2-gram). One counting pass per doc.
    */
  def repetitionStats(text: String): (Int, Int, Int) = {
    val ws = words(text)
    if (ws.length < 2) return (0, 0, 0)
    val m = new java.util.HashMap[String, Int]()
    val n = ws.length - 1
    var top = 0
    var i = 0
    while (i < n) {
      val c = m.merge(ws(i) + "_" + ws(i + 1), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    (n, n - m.size, top)
  }
}

/** Dense-vector kernels for the similarity-search pack. */
object VectorOps {

  /** Cosine similarity in double precision. */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  // 2^8 = 256 buckets: enough collision mass for corpus-scale candidate
  // generation; raise for bigger corpora (bits ~ log2(n_vectors / wanted
  // bucket size)).
  val NumHyperplanes = 8

  private val hyperplanes: Array[Array[Double]] = {
    val rnd = new java.util.Random(7)
    Array.fill(NumHyperplanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id (8-bit signature, 256 buckets). Vectors in the same
    * bucket are cosine-similar with high probability; at scale the ANN join
    * shuffles on this bucket id instead of going all-pairs.
    */
  def hyperplaneBucket(v: Seq[Float]): Int = {
    var sig = 0
    var p = 0
    while (p < NumHyperplanes) {
      val plane = hyperplanes(p)
      var dot = 0.0
      val n = math.min(v.length, plane.length)
      var i = 0
      while (i < n) { dot += v(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  // kNN-GRAPH candidate tables: T independent 6-bit hyperplane tables
  // (64 buckets each). One 8-bit table is too selective for graph
  // construction — most nodes would see too few candidates to fill k
  // neighbors; the union over T coarser tables is the standard
  // multi-table LSH recall fix. Seeds 1000+t; mirrored bit-exactly by
  // tools/pin_l52.py's JavaRandom reimplementation.
  val KnnTables = 4
  val KnnBits = 6
  private val knnPlanes: Array[Array[Array[Double]]] =
    Array.tabulate(KnnTables) { t =>
      val rnd = new java.util.Random(1000L + t)
      Array.fill(KnnBits)(Array.fill(64)(rnd.nextGaussian()))
    }

  /** Per-table bucket keys for the kNN-graph candidate join: entry t is
    * t*64 + the 6-bit signature under table t (key space disjoint across
    * tables, so one explode+self-join covers all tables).
    */
  def knnBuckets(v: Seq[Float]): Array[Int] =
    Array.tabulate(KnnTables) { t =>
      var sig = 0
      var p = 0
      while (p < KnnBits) {
        val plane = knnPlanes(t)(p)
        var dot = 0.0
        val n = math.min(v.length, plane.length)
        var i = 0
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      t * 64 + sig
    }
}
