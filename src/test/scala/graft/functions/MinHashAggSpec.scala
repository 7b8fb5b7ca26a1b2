package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** The native `minhash_agg` TypedImperativeAggregate must produce exactly
  * the kernel's signatures — including across partial/merge boundaries
  * and with duplicate inputs (min absorbs them).
  */
class MinHashAggSpec extends AnyFunSuite with SharedSpark {

  test("minhash_agg equals TextOps.minhashSignature, merged across partitions") {
    graft.GraftSession.registerAll(spark)
    import spark.implicits._
    val shingles = Seq("alpha", "beta", "gamma", "beta", "delta", "alpha",
      "epsilon", "zeta")
    val agg = shingles.toDF("s").repartition(4)
      .agg(expr("minhash_agg(s)")).head().getSeq[Long](0)
    val exp = TextOps.minhashSignature(shingles.distinct)
    assert(agg.toArray.sameElements(exp))
  }

  test("grouped minhash_agg matches per-group kernel signatures") {
    graft.GraftSession.registerAll(spark)
    import spark.implicits._
    val rows = Seq(("g1", "a"), ("g1", "b"), ("g2", "c"), ("g2", "a"),
      ("g1", "a"), ("g2", "d"))
    val got = rows.toDF("g", "s").repartition(3)
      .groupBy(col("g")).agg(expr("minhash_agg(s)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val exp = TextOps.minhashSignature(rs.map(_._2).distinct)
      assert(got(g).sameElements(exp), g)
    }
  }
}
