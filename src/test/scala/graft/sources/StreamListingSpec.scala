package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.SharedSpark

/** Committed-prefix skip in GraftMicroBatchStream: a trigger must sort only
  * files PAST the committed boundary key, not re-sort everything ever
  * landed — the difference between O(new) and O(all-files log all-files)
  * per trigger at a 100 TB landing zone.
  */
class StreamListingSpec extends AnyFunSuite with SharedSpark {

  test("steady-state triggers sort only newly-arrived files, not the full directory") {
    val dir = graft.TestTmp.dir("graft_stream_many").toString
    val ckpt = graft.TestTmp.dir("graft_stream_many_ckpt").toString
    val out = graft.TestTmp.dir("graft_stream_many_out").toString

    def writeFasta(name: String, id: String): Unit = {
      val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
      java.nio.file.Files.writeString(tmp, s">$id\nATCG\n")
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    (0 until 300).foreach(i => writeFasta(f"a$i%04d.fasta", s"a$i"))

    val q = spark.readStream.format("fasta").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 300)

      // after the 300-file batch committed, later triggers must filter the
      // committed prefix out BEFORE sorting — only new arrivals reach the
      // sort (the O(all-files log all-files) per-trigger stall at a 100 TB
      // landing zone is exactly this re-sort)
      Thread.sleep(1100) // distinct mtime past the committed boundary key
      GraftMicroBatchStream.maxTriggerSortedFiles.set(-1)
      (0 until 3).foreach(i => writeFasta(f"b$i%04d.fasta", s"b$i"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 303)
      val sorted = GraftMicroBatchStream.maxTriggerSortedFiles.get()
      assert(sorted >= 0, "no trigger listed after reset")
      assert(sorted <= 3, s"a trigger re-sorted $sorted files, expected <= 3")
    } finally q.stop()
  }
}
