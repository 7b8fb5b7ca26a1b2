package graft.sources.formats

/** Byte-wise carryless range decoder (Subbotin/Shelwien form, the public
  * fqzcomp/htscodecs lineage) shared by the CRAM 3.1 adaptive-arithmetic
  * (method 6) and fqzcomp (method 7) codecs: 32-bit range initialised to
  * 2^32-1, code primed with 5 bytes (the first is the encoder's cache
  * flush), renormalising a byte at a time while range < 2^24.
  */
private[formats] final class RangeDecoder(next: () => Int) {
  private var range = 0xffffffffL
  private var code = {
    var c = 0L
    var i = 0
    while (i < 5) { c = ((c << 8) | next()) & 0xffffffffL; i += 1 }
    c
  }
  def getFreq(tot: Int): Int = {
    range /= tot
    val f = code / range
    (if (f >= tot) tot - 1 else f).toInt
  }
  def decode(cum: Int, freq: Int): Unit = {
    code -= cum * range
    range *= freq
    while (range < RangeCoder.TOP) {
      range <<= 8
      code = (code << 8) | next()
    }
  }
}

private[formats] object RangeCoder {
  val TOP: Int = 1 << 24
  val STEP: Int = 16
  val MAX_FREQ: Int = (1 << 16) - 17
}

/** Adaptive symbol model: freq[i] starts 1, +STEP per hit, halved
  * (rounding up) past MAX_FREQ; hot symbols bubble one slot toward the
  * front after each update — encoder and decoder apply identical updates,
  * so the models stay in lock-step.
  */
private[formats] final class ByteModel(nsym: Int) {
  private val freq = Array.fill(nsym)(1)
  private val sym = Array.tabulate(nsym)(identity)
  private var total = nsym

  def decode(rc: RangeDecoder): Int = {
    val f = rc.getFreq(total)
    var cum = 0
    var i = 0
    while (cum + freq(i) <= f) { cum += freq(i); i += 1 }
    rc.decode(cum, freq(i))
    val s = sym(i)
    freq(i) += RangeCoder.STEP
    total += RangeCoder.STEP
    if (total > RangeCoder.MAX_FREQ) {
      total = 0
      var j = 0
      while (j < nsym) { freq(j) -= freq(j) >> 1; total += freq(j); j += 1 }
    }
    if (i > 0 && freq(i) > freq(i - 1)) {
      val tf = freq(i); freq(i) = freq(i - 1); freq(i - 1) = tf
      val ts = sym(i); sym(i) = sym(i - 1); sym(i - 1) = ts
    }
    s
  }
}
