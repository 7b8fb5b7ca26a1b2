package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySmokeSpec extends AnyFunSuite with SharedSpark {
  test("driver smoke: SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("queries and oracleSql keys align") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
  }
}
