package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL audio decode path (javax.sound.sampled WAV) and the
  * energy-envelope fingerprint kernel that l69/l70 run on executors.
  *
  * The pinned values below were produced by tools/pin_l69.py — the Python
  * STDLIB `wave` module (an independent RIFF/fmt/data parser) plus an
  * independent envelope-hash implementation — run against the exact WAV
  * bytes graft.tools.WavPin dumps. If the JDK codec mis-wrote/mis-read the
  * PCM, or decode were a stub, these would not match.
  */
class AudioOpsSpec extends AnyFunSuite {

  test("WAV round-trip is lossless: decoded samples equal the synthesis formula") {
    for ((frames, seed) <- Seq((400, 0L), (700, 17L), (1000, 499L))) {
      val clip = AudioOps.decode(AudioOps.synthWav(frames, seed))
      assert(clip.sampleRate == 8000 && clip.channels == 2 && clip.frames == frames)
      for (i <- 0 until frames; c <- 0 until 2)
        assert(clip.samples(2 * i + c) == AudioOps.sample(i, c, seed),
          s"sample ($i,$c) seed=$seed")
    }
  }

  test("envelope hash on a near-dup clip equals the window-arithmetic derivation") {
    for (docId <- Seq(0L, 1L, 5L, 42L, 403L)) {
      val (hi, lo) = AudioOps.envelopeHash(AudioOps.decode(AudioOps.neardupWav(docId)))
      // independent derivation straight from the construction (mirrors the
      // l70 DuckDB oracle): cell w is the window amplitude, bit w set when
      // cell(w) < cell(w+1) — the amp*100 scale preserves every comparison
      val seed = docId / 4
      val k = (docId % 4).toInt
      def cell(w: Int): Int = {
        val v = AudioOps.windowAmp(w, seed)
        if (k > 0 && w == (7 * k) % 65) 255 - v else v
      }
      var hash = 0L
      for (b <- 0 until 64) if (cell(b) < cell(b + 1)) hash |= 1L << b
      assert((hi, lo) == (hash >>> 32, hash & 0xffffffffL), s"doc $docId")
    }
  }

  test("near-dup structure: within-group hamming small, cross-group large") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val hs = (0L until 16L).map(id =>
      AudioOps.envelopeHash(AudioOps.decode(AudioOps.neardupWav(id)))).toArray
    for (g <- 0 until 4; i <- 0 until 4; j <- i + 1 until 4)
      assert(ham(hs(g * 4 + i), hs(g * 4 + j)) <= 4,
        s"within group $g: docs ${g * 4 + i},${g * 4 + j}")
    val cross = for (a <- 0 until 4; b <- 4 until 8) yield ham(hs(a), hs(b))
    assert(cross.min > 6, s"cross-group collided: $cross")
  }

  test("undecodable payloads and non-PCM formats raise loudly") {
    intercept[IllegalArgumentException] {
      AudioOps.decode(Array[Byte](1, 2, 3, 4))
    }
    // truncated WAV: a valid header whose data chunk is cut short
    val ok = AudioOps.synthWav(400, 3L)
    intercept[IllegalArgumentException] {
      AudioOps.decode(java.util.Arrays.copyOf(ok, ok.length / 2))
    }
  }

  test("bomb guard: a header declaring far more frames than maxSamples refuses early") {
    val bytes = AudioOps.synthWav(2000, 5L)
    val ex = intercept[IllegalArgumentException] {
      AudioOps.decode(bytes, maxSamples = 1000)
    }
    assert(ex.getMessage.contains("decode bound"), ex.getMessage)
    // and a legitimate clip still decodes through the same entry point
    assert(AudioOps.decode(bytes).frames == 2000)
  }

  test("decode-gate metrics pinned by the independent stdlib wave parser (tools/pin_l69.py)") {
    // keep the byte-level artifacts reproducible for the Python tool
    val dir = java.nio.file.Paths.get("target/wavpin")
    java.nio.file.Files.createDirectories(dir)
    val got = graft.tools.WavPin.SynthIds.map { case (id, frames) =>
      val bytes = AudioOps.synthWav(frames, id)
      java.nio.file.Files.write(dir.resolve(s"s$id.wav"), bytes)
      val clip = AudioOps.decode(bytes)
      var sl = 0L; var sr = 0L; var ncl = 0L
      for (i <- clip.samples.indices) {
        val v = clip.samples(i)
        if (i % 2 == 0) sl += v else sr += v
        if (v >= 32000 || v <= -32000) ncl += 1
      }
      (id, clip.sampleRate, clip.channels, clip.frames, sl, sr, ncl)
    }
    val pinned = Seq( // output of: python3 tools/pin_l69.py target/wavpin
      (0L, 8000, 2, 400, 147605L, -480215L, 26L),
      (1L, 8000, 2, 700, -718269L, 343599L, 33L),
      (17L, 8000, 2, 1000, -1846897L, -1915807L, 46L),
      (499L, 8000, 2, 500, 231078L, -75757L, 22L))
    assert(got == pinned)
  }

  test("envelope hashes pinned by the independent stdlib wave parser (tools/pin_l69.py)") {
    val dir = java.nio.file.Paths.get("target/wavpin")
    java.nio.file.Files.createDirectories(dir)
    val got = graft.tools.WavPin.NeardupIds.map { id =>
      val bytes = AudioOps.neardupWav(id)
      java.nio.file.Files.write(dir.resolve(s"n$id.wav"), bytes)
      val (hi, lo) = AudioOps.envelopeHash(AudioOps.decode(bytes))
      (id, hi, lo)
    }
    val pinned = Seq( // output of: python3 tools/pin_l69.py target/wavpin
      (0L, 493169490L, 3039386955L),
      (1L, 493169490L, 3039387019L),
      (2L, 493169490L, 3039386955L),
      (3L, 493169490L, 3039386955L),
      (7L, 1163835189L, 1255485285L),
      (42L, 363809352L, 2907936421L),
      (123L, 1533351497L, 3127266582L),
      (499L, 1502817374L, 2762549996L))
    assert(got == pinned)
  }
}
