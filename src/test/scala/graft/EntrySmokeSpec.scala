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

  // Guard against driver-side testdata schema drift (r7: events.ts changed
  // parquet type TIMESTAMP(NANOS) -> timestamp[us] and silently broke all
  // nine events queries). Tables.events must resolve at every scale factor.
  test("Tables.events resolves against every /root/testdata/sf* dir") {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getPath)
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val ev = graft.queries.Tables.events(spark, d)
      val tsType = ev.schema("ts").dataType
      assert(tsType == TimestampType || tsType == TimestampNTZType,
        s"$d: ts resolved to $tsType")
      assert(ev.limit(1).collect().nonEmpty, s"$d: events empty")
    }
  }
}
