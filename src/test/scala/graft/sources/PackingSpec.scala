package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Chunk-to-partition packing must stay O(n log n): a large listing packs in
  * milliseconds, and sizes respect the target split size.
  */
class PackingSpec extends AnyFunSuite {
  private def chunk(i: Int, len: Long) =
    FileChunk(s"f$i", 0, len, len, Array.empty)

  test("100k chunks pack in well under a second") {
    val chunks = (0 until 100000).map(i => chunk(i, 1000L + i % 977))
    val t0 = System.nanoTime()
    val parts = GraftScan.pack(chunks, openCost = 100L, maxSplit = 128L * 1024)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(parts.map(_.length).sum == 100000)
    assert(ms < 1000.0, s"packing took $ms ms")
    // every partition except possibly the last respects the target
    parts.foreach { p =>
      if (p.length > 1)
        assert(p.map(c => c.length + 100L).sum <= 128L * 1024 + 2000,
          "partition overshoots the split target")
    }
  }

  test("oversized chunks get their own partition; small ones pack together") {
    val parts = GraftScan.pack(
      Seq(chunk(1, 1 << 20), chunk(2, 10), chunk(3, 10), chunk(4, 10)),
      openCost = 0L, maxSplit = 1000L)
    assert(parts.length == 2)
    assert(parts.exists(_.length == 1) && parts.exists(_.length == 3))
  }
}
