package graft.tools

import graft.functions.AudioOps

/** Dump the WAV fixtures AudioOpsSpec pins, plus the Scala-side values, so
  * tools/pin_l69.py (stdlib `wave` parse — an independent RIFF reader) can
  * re-derive them:
  *
  *   sbt "runMain graft.tools.WavPin target/wavpin"
  *   python3 tools/pin_l69.py target/wavpin
  *
  * The two outputs must agree line for line; the agreed values are pinned
  * in AudioOpsSpec.
  */
object WavPin {
  val SynthIds: Seq[(Long, Int)] = Seq((0L, 400), (1L, 700), (17L, 1000), (499L, 500))
  val NeardupIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 7L, 42L, 123L, 499L)

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("target/wavpin"))
    java.nio.file.Files.createDirectories(dir)
    for ((id, frames) <- SynthIds) {
      val bytes = AudioOps.synthWav(frames, id)
      java.nio.file.Files.write(dir.resolve(s"s$id.wav"), bytes)
      val clip = AudioOps.decode(bytes)
      var sl = 0L; var sr = 0L; var ncl = 0L
      for (i <- clip.samples.indices) {
        val v = clip.samples(i)
        if (i % 2 == 0) sl += v else sr += v
        if (v >= 32000 || v <= -32000) ncl += 1
      }
      println(s"s$id ${clip.sampleRate} ${clip.channels} ${clip.frames} $sl $sr $ncl")
    }
    for (id <- NeardupIds) {
      val bytes = AudioOps.neardupWav(id)
      java.nio.file.Files.write(dir.resolve(s"n$id.wav"), bytes)
      val (hi, lo) = AudioOps.envelopeHash(AudioOps.decode(bytes))
      println(s"n$id $hi $lo")
    }
  }
}
