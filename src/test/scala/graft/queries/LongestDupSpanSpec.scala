package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** l50: the distributed binary search must reproduce tools/pin_l50.py's
  * independently-computed answer on the sf0.01 corpus, and behave on
  * degenerate inputs (no repeated unigram at all).
  */
class LongestDupSpanSpec extends AnyFunSuite with SharedSpark {

  test("l50 matches the pinned sf0.01 answer") {
    val row = LlmQueries.queries("l50_longest_dup_span")(
      spark, "/root/testdata/sf0.01").head()
    assert(row.getLong(0) == 93L, "max_n")
    assert(row.getLong(1) == 3L, "n_dup_grams")
    assert(row.getString(2).startsWith("group fast fast data row data "),
      "min_gram prefix")
    assert(row.getString(2).split(" ").length == 93, "min_gram token count")
    assert(row.getLong(3) == 2L, "min_gram_cnt")
  }

  test("corpus with no repeated token yields the zero row") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "d e f")).toDF("doc_id", "text")
    val out = LlmQueries.longestDupSpan(docs).head()
    assert((out.getLong(0), out.getLong(1), out.getString(2),
      out.getLong(3)) == ((0L, 0L, "", 0L)))
  }
}
