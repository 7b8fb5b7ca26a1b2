package graft.tools

import graft.sources._

/** Parser-only throughput probe (no Spark): times the raw line reader and
  * a format's record iterator on one file, isolating parse cost from scan
  * plumbing when the ScanBench numbers need explaining.
  *
  * Usage: ParseProf <file.fasta|file.gb> [reps] [fasta|genbank]
  */
object ParseProf {
  def main(args: Array[String]): Unit = {
    val f = new java.io.File(args(0))
    val reps = if (args.length > 1) args(1).toInt else 3
    val fam = if (args.length > 2) args(2)
              else if (args(0).endsWith(".gb")) "genbank" else "fasta"
    println(s"file: $f len=${f.length} family=$fam")
    for (_ <- 1 to reps) {
      var t0 = System.nanoTime()
      var in = new java.io.FileInputStream(f)
      val blr = new ByteLineReader(in, 0)
      var nl = 0L; var bytes = 0L
      while (blr.readLineSpan()) { nl += 1; bytes += blr.lineLen }
      in.close()
      println(f"lines only : ${(System.nanoTime() - t0) / 1e9}%6.3f s" +
        f" ($nl lines, $bytes bytes, ${bytes / 1e6 / ((System.nanoTime() - t0) / 1e9)}%.0f MB/s)")
      t0 = System.nanoTime()
      in = new java.io.FileInputStream(f)
      val blr2 = new ByteLineReader(in, 0)
      val input = new RecordInput(() => blr2, in, Long.MaxValue, false)
      fam match {
        case "genbank" =>
          // full projection (all 15 columns) — the decode-rate shape
          val it = graft.sources.formats.GenBankFormat.records(
            input, Array.tabulate(15)(identity))
          var n = 0L; var sl = 0L
          while (it.hasNext) {
            val r = it.next(); n += 1
            sl += r(0).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numBytes()
          }
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"genbank parse: $dt%6.3f s  ($n records, seqbytes=$sl, " +
            f"${f.length / 1e6 / dt}%.0f MB/s)")
        case _ =>
          val it = graft.sources.formats.FastaFormat.records(input, Array(0, 1, 2))
          var n = 0L; var sl = 0L
          while (it.hasNext) {
            val r = it.next(); n += 1
            sl += r(2).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numBytes()
          }
          println(f"fasta parse: ${(System.nanoTime() - t0) / 1e9}%6.3f s  ($n records, seqbytes=$sl)")
      }
      in.close()
    }
  }
}
