package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import org.apache.spark.sql.functions._

/** Parallel driver-side file listing: a wide hive layout must be listed by
  * concurrent per-directory listStatus calls (the bounded-pool fan-out), and
  * the result — file set, partition columns, partition values — must be
  * identical to what the old serial walk produced.
  */
class ListingSpec extends AnyFunSuite with SharedSpark {

  test("wide hive layout lists in parallel with deterministic results") {
    val root = graft.TestTmp.dir("graft_listing").toFile
    val nDirs = 512
    (0 until nDirs).foreach { i =>
      val d = new java.io.File(root, f"lang=l$i%03d")
      d.mkdirs()
      val w = new java.io.FileWriter(new java.io.File(d, "part.fasta"))
      w.write(s">seq$i desc\nACGT\n")
      w.close()
    }

    GraftScan.maxConcurrentListings.set(0)
    val df = spark.read.format("fasta").load(root.getAbsolutePath)
    assert(df.columns.contains("lang"))
    assert(df.count() == nDirs)
    assert(GraftScan.maxConcurrentListings.get() > 1,
      s"max concurrent listings = ${GraftScan.maxConcurrentListings.get()}")

    // partition pruning still works on the parallel listing
    assert(df.filter(col("lang") === "l007").count() == 1)

    // two listings of the same layout are identical (parallel walk must be
    // deterministic: files sorted, columns ordered by depth)
    val t1 = new GraftTable(graft.sources.formats.FastaFormat,
      Map("path" -> root.getAbsolutePath))
    val t2 = new GraftTable(graft.sources.formats.FastaFormat,
      Map("path" -> root.getAbsolutePath))
    val (f1, c1) = t1.listNow()
    val (f2, c2) = t2.listNow()
    assert(c1 == Seq("lang") && c2 == Seq("lang"))
    assert(f1.map(_._1.getPath.toString) == f2.map(_._1.getPath.toString))
    assert(f1.map(_._2.toSeq) == f2.map(_._2.toSeq))
    assert(f1.size == nDirs)
  }

  test("nested hive layout orders partition columns by depth") {
    val root = graft.TestTmp.dir("graft_listing_nested").toFile
    for (a <- 0 until 3; b <- 0 until 4) {
      val d = new java.io.File(root, s"outer=$a/inner=$b")
      d.mkdirs()
      val w = new java.io.FileWriter(new java.io.File(d, "part.fasta"))
      w.write(s">seq${a}_$b\nACGT\n")
      w.close()
    }
    val df = spark.read.format("fasta").load(root.getAbsolutePath)
    val cols = df.columns.toSeq
    assert(cols.indexOf("outer") < cols.indexOf("inner"),
      s"partition columns out of depth order: $cols")
    assert(df.count() == 12)
    assert(df.filter(col("outer") === "1" && col("inner") === "2").count() == 1)
  }
}
