package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Audio kernels for the multimodal pipeline queries (l69/l70) — the audio
  * analog of [[ImageOps]].
  *
  * The decode path is REAL: bytes go through `javax.sound.sampled`'s WAV
  * reader (RIFF/fmt/data chunk parsing, PCM frame extraction), so a query
  * downstream of [[decode]] only sees sample values that survived an actual
  * codec round-trip. 16-bit PCM WAV is lossless, which is what lets the
  * DuckDB oracles recompute expected per-channel sample sums from the
  * synthesis formula: if the decoder were a stub, the sums, clipping counts
  * and energy-envelope fingerprints could not match. An independent
  * pure-Python parse (stdlib `wave` module, tools/pin_l69.py) pins the same
  * bytes a third way in AudioOpsSpec.
  *
  * Synthesis reuses the [[ImageOps.blockValue]] spatial-hash fold (Teschner
  * et al. primes + quadratic scatter) on (frame, channel) so every sample is
  * exactly recomputable in SQL with all intermediates below 2^40.
  */
object AudioOps {

  /** Fixed corpus rate: 8 kHz, so `durationMs = frames * 1000 / 8000 =
    * frames / 8` stays pure integer arithmetic in Spark and DuckDB alike.
    */
  val SampleRate = 8000

  /** Cached audio SPI providers. `AudioSystem.getAudioInputStream` /
    * `AudioSystem.write` re-run ServiceLoader provider discovery on EVERY
    * call — a `ClassLoader.getResources` walk over the whole executor
    * classpath (~350 jars on a Spark node): JFR on the 500k-clip ratchet
    * showed ~90% of decode samples inside URLClassPath/ZipFile entry
    * lookups. The SPI classes are public; loading them ONCE keeps the
    * decode going through the exact same JDK codec objects AudioSystem
    * would pick, minus the per-call scan (l69 at 500k: 106 s -> see
    * BENCH_NOTES_r16). Instances are per-thread because the SPI contract
    * does not promise thread safety.
    */
  private val audioReaders
      : ThreadLocal[List[javax.sound.sampled.spi.AudioFileReader]] =
    ThreadLocal.withInitial { () =>
      import scala.jdk.CollectionConverters._
      val all = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toList
      // WAVE readers first: the JDK's SoftMidiAudioFileReader otherwise
      // sits ahead of WaveFileReader in provider order and its accept
      // probe calls MidiSystem.getSequence, which re-runs MIDI provider
      // discovery (a full classpath scan) on EVERY payload
      val (wave, rest) = all.partition(_.getClass.getSimpleName.contains("Wave"))
      wave ++ rest
    }

  /** Last reader that accepted a payload on this thread — tried first, so
    * a homogeneous corpus never pays the reject probes of other formats.
    */
  private val lastReader =
    new ThreadLocal[javax.sound.sampled.spi.AudioFileReader]
  private val wavWriter: ThreadLocal[javax.sound.sampled.spi.AudioFileWriter] =
    ThreadLocal.withInitial { () =>
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException("audio: no WAV writer SPI"))
    }

  /** Signed 16-bit sample for frame `i`, channel `c`, seeded stream: the
    * quadratic hash fold scattered over the full int16 range — wideband
    * deterministic noise, so per-channel sums and clipping counts are
    * strong checks of a true decode.
    */
  def sample(i: Int, c: Int, seed: Long): Int = {
    val hm = (i * 73856093L + c * 19349663L + seed * 83492791L) % 1000003L
    ((((hm * hm + hm * 7919L) % 1000003L) % 65536L) - 32768L).toInt
  }

  /** Encode interleaved 16-bit samples as a WAV container through the JDK
    * codec (`AudioSystem.write`, RIFF/WAVE PCM_SIGNED little-endian) — the
    * same round-trip discipline as [[ImageOps.toPng]]: the pixels/samples
    * exist only as encoded container bytes between pipeline stages.
    */
  def toWav(samples: Array[Int], channels: Int): Array[Byte] = {
    require(samples.length % channels == 0, "audio: ragged frame")
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    wavWriter.get().write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthetic stereo clip for the l69 decode gate: `frames` frames of
    * two independent full-range noise channels (channel index enters the
    * hash), WAV-encoded.
    */
  def synthWav(frames: Int, seed: Long): Array[Byte] = {
    val samples = new Array[Int](frames * 2)
    var i = 0
    while (i < frames) {
      samples(2 * i) = sample(i, 0, seed)
      samples(2 * i + 1) = sample(i, 1, seed)
      i += 1
    }
    toWav(samples, channels = 2)
  }

  /** Decoded clip: sample rate, channel count, interleaved signed-16
    * samples reconstructed from the PCM frames the JDK codec yields.
    */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Int]) {
    def frames: Int = samples.length / channels
  }

  /** REAL decode via `javax.sound.sampled`: parses the RIFF/fmt/data
    * chunks, verifies 16-bit signed PCM, and reconstructs the interleaved
    * samples. Raises loudly on undecodable or non-PCM payloads rather than
    * fabricating samples — same fail-loud contract as [[ImageOps.decode]].
    *
    * Bomb guard: the frame count is declared in the header; `maxSamples`
    * bounds the decode buffer BEFORE allocation, so a crafted header
    * declaring hours of audio fails its task loudly instead of OOMing the
    * executor.
    */
  def decode(bytes: Array[Byte], maxSamples: Long = 1L << 26): Clip = {
    // first cached SPI reader that accepts the payload — the AudioSystem
    // dispatch contract (UnsupportedAudioFileException = try the next),
    // without the per-call provider rediscovery (see audioReaders); the
    // sticky last-successful reader goes first
    var ais: AudioInputStream = null
    val sticky = lastReader.get()
    if (sticky != null) {
      try ais = sticky.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    if (ais == null) {
      val it = audioReaders.get().iterator
      while (ais == null && it.hasNext) {
        val r = it.next()
        if (r ne sticky) {
          try {
            ais = r.getAudioInputStream(new ByteArrayInputStream(bytes))
            lastReader.set(r)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          }
        }
      }
    }
    if (ais == null)
      throw new IllegalArgumentException("audio: undecodable payload")
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16,
        s"audio: expected 16-bit signed PCM, got $fmt")
      val frames = ais.getFrameLength
      val channels = fmt.getChannels
      require(frames >= 0 && frames * channels <= maxSamples,
        s"audio: declared $frames frames x $channels ch exceeds the " +
          s"$maxSamples-sample decode bound (bomb?)")
      val n = frames.toInt * channels
      val pcm = ais.readNBytes(n * 2)
      require(pcm.length == n * 2,
        s"audio: truncated PCM payload (${pcm.length} of ${n * 2} bytes)")
      val big = fmt.isBigEndian
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (big) (pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xff)
          else (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
        i += 1
      }
      Clip(fmt.getSampleRate.toInt, channels, out)
    } finally ais.close()
  }

  /** l70 corpus geometry: 65 amplitude windows x `WindowFrames` frames of
    * mono square wave — the 1-D analog of the l67 36x32 block image. The
    * energy envelope has 65 cells, so the adjacent-cell comparison hash
    * below yields 64 bits, banding into the same 4x16-bit LSH layout as
    * the image near-dup stack.
    */
  val Windows = 65
  val WindowFrames = 16
  val AmpScale = 100

  /** Amplitude (0..255) of window `w` for a seed — [[ImageOps.blockValue]]
    * on a 1-D grid, so the DuckDB oracle reuses the same arithmetic.
    */
  def windowAmp(w: Int, seed: Long): Int = ImageOps.blockValue(w, 0, seed)

  /** Near-dup corpus clip: docs in the same group of four share a seed;
    * variants k=1..3 invert ONE window's amplitude (255-a) — a local
    * perturbation that moves at most two envelope-hash bits, while
    * distinct groups differ in ~half the bits. Signal in window w is a
    * +-(amp*100) square wave (alternating sign per frame), so the decoded
    * per-window mean |sample| is exactly amp*100.
    */
  def neardupWav(docId: Long): Array[Byte] = {
    val seed = docId / 4
    val k = (docId % 4).toInt
    val pw = (7 * k) % Windows
    val samples = new Array[Int](Windows * WindowFrames)
    var w = 0
    while (w < Windows) {
      val base = windowAmp(w, seed)
      val amp = (if (k > 0 && w == pw) 255 - base else base) * AmpScale
      var f = 0
      while (f < WindowFrames) {
        val i = w * WindowFrames + f
        samples(i) = if (f % 2 == 0) amp else -amp
        f += 1
      }
      w += 1
    }
    toWav(samples, channels = 1)
  }

  /** Energy-envelope fingerprint over a decoded mono clip: 65 cells of
    * mean |sample| (floor division), bit b set when cell(b) < cell(b+1) —
    * the dHash recipe on the time axis. Returned as (hi32, lo32) so the
    * SQL oracle never touches the int64 sign bit.
    */
  def envelopeHash(clip: Clip): (Long, Long) = {
    require(clip.channels == 1, s"audio: envelope wants mono, got ${clip.channels}")
    val n = clip.samples.length
    val cells = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val f0 = w.toLong * n / Windows
      val f1 = (w + 1).toLong * n / Windows
      var sum = 0L
      var i = f0.toInt
      while (i < f1) { sum += math.abs(clip.samples(i).toLong); i += 1 }
      cells(w) = if (f1 > f0) sum / (f1 - f0) else 0L
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (cells(b) < cells(b + 1)) hash |= 1L << b
      b += 1
    }
    (hash >>> 32, hash & 0xffffffffL)
  }
}
