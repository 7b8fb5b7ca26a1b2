package graft.tools

import graft.sources._

/** Parser-only throughput probe (no Spark): times the raw line reader and
  * the FASTA record iterator on one file, isolating parse cost from scan
  * plumbing when the ScanBench numbers need explaining.
  *
  * Usage: ParseProf <file.fasta> [reps]
  */
object ParseProf {
  def main(args: Array[String]): Unit = {
    val f = new java.io.File(args(0))
    val reps = if (args.length > 1) args(1).toInt else 3
    println(s"file: $f len=${f.length}")
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
      val it = graft.sources.formats.FastaFormat.records(input, Array(0, 1, 2))
      var n = 0L; var sl = 0L
      while (it.hasNext) {
        val r = it.next(); n += 1
        sl += r(2).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numBytes()
      }
      in.close()
      println(f"fasta parse: ${(System.nanoTime() - t0) / 1e9}%6.3f s  ($n records, seqbytes=$sl)")
    }
  }
}
