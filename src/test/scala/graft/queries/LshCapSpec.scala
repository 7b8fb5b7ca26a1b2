package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** MinHash-LSH hot-bucket cap: a degenerate all-duplicates corpus must not
  * produce O(n^2) candidate pairs on one task — oversized buckets are
  * dropped (and counted) before the pair join.
  */
class LshCapSpec extends AnyFunSuite with SharedSpark {

  private def corpus(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("degenerate corpus: all buckets over the cap are dropped, not exploded") {
    // 3000 identical documents: every band maps all docs to one bucket.
    val docs = corpus((0L until 3000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again")))
    val pairs = LlmQueries.minhashCandidatePairs(docs, maxBucket = 100)
    // 16 bands x one degenerate bucket each, all over the cap -> no pairs
    // (identical docs are still caught by exact dedup / other corpora bands).
    assert(pairs.count() == 0, "capped run must drop the degenerate buckets")
  }

  test("cap does not change results when no bucket is hot") {
    val docs = corpus(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine ten eleven"),
      (5L, "completely different words with no overlap whatsoever here now")))
    val capped = LlmQueries.minhashCandidatePairs(docs, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = LlmQueries.minhashCandidatePairs(docs, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    assert(capped.contains((1L, 2L)), "identical docs must be candidates")
  }
}
