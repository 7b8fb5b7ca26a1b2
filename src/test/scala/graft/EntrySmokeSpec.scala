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

  // Canary for driver-side testdata CONTENT drift: the pinned oracles
  // (l05/l07/l12/l25/l35/l36/l38) encode literal results computed from the
  // current sf0.01 documents/embeddings tables. If the driver regenerates
  // the testdata with a new seed, this fails loudly with instructions
  // instead of leaving seven queries mysteriously red.
  test("sf0.01 pinned-oracle inputs unchanged (else re-run tools/pin_*.py)") {
    val d = "/root/testdata/sf0.01"
    val msg = "testdata regenerated? re-run tools/pin_l35.py, pin_l36.py, " +
      "pin_l38.py, pin_l39.py, pin_l40.py, pin_l43.py, pin_l25.py, " +
      "pin_l05_l07.py, pin_l12.py, pin_l50.py, pin_l52.py, pin_l54.py, " +
      "pin_l60.py and refresh the pinned VALUES oracles " +
      "in LlmQueries"
    val docs = graft.queries.Tables.documents(spark, d)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("n_chars"),
        org.apache.spark.sql.functions.sum("doc_id")).head()
    assert((docs.getLong(0), docs.getLong(1), docs.getLong(2)) ==
      ((500L, 149174L, 124750L)), msg)
    val emb = graft.queries.Tables.embeddings(spark, d)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("vec_id"),
        org.apache.spark.sql.functions.sum("label")).head()
    assert((emb.getLong(0), emb.getLong(1), emb.getLong(2)) ==
      ((500L, 124750L, 2270L)), msg)
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
