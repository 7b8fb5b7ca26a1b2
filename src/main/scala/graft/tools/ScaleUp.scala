package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build an sf1-scale corpus by replicating the sf0.1 tables COPIES (10)
  * times with shifted keys, for the scale ratchet (every per-round number
  * is sf0.1, where fixed costs dominate — sf1 is where per-byte work
  * does). Replication preserves the driver generator's distributions;
  * joins stay consistent because l_orderkey and o_orderkey shift by the
  * same span. Copies of a document get a per-copy tag token appended (so
  * exact dedup cannot collapse them) but remain near-duplicates of each
  * other — near-dup pipelines see DENSER candidate sets than an organic
  * sf1, making their timings a conservative (harder) bound. Embedding copies
  * get a tiny per-copy offset to avoid exact ties.
  *
  *   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = sys.env.getOrElse("GRAFT_SCALE_COPIES", "10").toInt
    val done = new java.io.File(dst, "_done")
    if (done.exists()) { println(s"ScaleUp: $dst already built"); return }
    val spark = graft.LocalSession.buildBench(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(df, i)).reduce(_ unionAll _)
    def save(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val events = spark.read.parquet(s"$src/events.parquet")

    val keySpan = orders.agg(max("o_orderkey")).head.getLong(0) + 1
    val docSpan = documents.agg(max("doc_id")).head.getLong(0) + 1
    val vecSpan = embeddings.agg(max("vec_id")).head.getLong(0) + 1
    val evSpan = events.agg(max("event_id")).head.getLong(0) + 1

    save(rep(lineitem) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * keySpan))
    }, "lineitem", 32)
    save(rep(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * keySpan))
    }, "orders", 16)
    save(rep(documents) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text", concat(col("text"), lit(s" c$i")))
        // suffix " c$i" is 3 bytes only for i<10; keep n_chars exact
        .withColumn("n_chars", col("n_chars") + lit(2L + i.toString.length))
    }, "documents", 16)
    save(rep(embeddings) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vecSpan))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i.toFloat * 1e-4f)))
    }, "embeddings", 8)
    save(rep(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * evSpan))
    }, "events", 16)

    // dimensions stay as-is (10x fanout per dim key, like a real scale-up)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      save(spark.read.parquet(s"$src/$t.parquet"), t, 1)
    }
    done.createNewFile()
    println(s"ScaleUp: built $dst (${copies}x $src)")
    spark.stop()
  }
}
