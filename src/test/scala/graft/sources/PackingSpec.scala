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
    // best-of-3 so a GC pause or CPU contention from a parallel suite can't
    // flake a complexity guard (this asserts O(n) packing, not wall-clock)
    val ms = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val parts = GraftScan.pack(chunks, openCost = 100L, maxSplit = 128L * 1024)
      assert(parts.map(_.length).sum == 100000)
      (System.nanoTime() - t0) / 1e6
    }.min
    val parts = GraftScan.pack(chunks, openCost = 100L, maxSplit = 128L * 1024)
    assert(ms < 1000.0, s"packing took $ms ms (best of 3)")
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

  test("mergeVirtualRanges coalesces overlapping and touching ranges") {
    assert(GraftScan.mergeVirtualRanges(Nil) == Nil)
    assert(GraftScan.mergeVirtualRanges(Seq((5L, 10L))) == Seq((5L, 10L)))
    assert(GraftScan.mergeVirtualRanges(
      Seq((5L, 10L), (8L, 20L), (20L, 25L), (30L, 40L), (1L, 2L))) ==
      Seq((1L, 2L), (5L, 25L), (30L, 40L)))
    // identical duplicates collapse
    assert(GraftScan.mergeVirtualRanges(Seq((5L, 10L), (5L, 10L))) == Seq((5L, 10L)))
    // contained range disappears
    assert(GraftScan.mergeVirtualRanges(Seq((5L, 100L), (10L, 20L))) == Seq((5L, 100L)))
  }
}
