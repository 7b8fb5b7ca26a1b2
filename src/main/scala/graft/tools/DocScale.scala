package graft.tools

import org.apache.spark.sql.functions._

/** Build a documents-ONLY scaled corpus for the multimodal ratchet runs
  * (the image/audio l-queries derive every payload from doc_id + text
  * length, so replicating `documents` alone scales the codec pipelines
  * without paying for the full TPC-H replication ScaleUp does).
  *
  *   GRAFT_SCALE_COPIES=100 sbt "runMain graft.tools.DocScale /root/testdata/sf0.1 /tmp/graft_docs100x"
  *
  * doc_id shifts by the source span per copy; the span is a multiple of 4,
  * so the group-of-four near-dup structure never straddles copies and each
  * copy contributes fresh groups (new seeds), keeping LSH bucket sizes
  * realistic rather than exploding one bucket 100x.
  */
object DocScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_docs100x")
    val copies = sys.env.getOrElse("GRAFT_SCALE_COPIES", "100").toInt
    val done = new java.io.File(dst, "_done")
    if (done.exists()) { println(s"DocScale: $dst already built"); return }
    val spark = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = documents.agg(max("doc_id")).head.getLong(0) + 1
    require(docSpan % 4 == 0,
      s"doc span $docSpan not a multiple of 4: copies would straddle near-dup groups")
    (0 until copies).map { i =>
      documents.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text", concat(col("text"), lit(s" c$i")))
        // suffix " c$i" is 3 bytes only for i<10; keep n_chars exact
        .withColumn("n_chars", col("n_chars") + lit(2L + i.toString.length))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    require(done.createNewFile())
    println(s"DocScale: wrote ${copies}x documents to $dst")
    spark.stop()
  }
}
