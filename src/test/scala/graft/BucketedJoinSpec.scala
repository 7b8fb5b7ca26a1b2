package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing proof for the 100 TB story: two tables bucketed the same way
  * on the join key must join WITHOUT a shuffle exchange — the technique
  * that turns a repeated petabyte-scale join (e.g. dedup-pairs x corpus,
  * lineitem x orders) from one full shuffle per run into zero.
  */
class BucketedJoinSpec extends AnyFunSuite with SharedSpark {

  test("same-bucketed tables join with no Exchange on either side") {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    // the in-memory catalog is fresh per JVM but the warehouse directory
    // persists — clear both or a crashed earlier run wedges this one
    def dropHard(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    dropHard("li_bucketed")
    dropHard("o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("o_bucketed")

    // disable auto-broadcast: at this SF the small side would broadcast,
    // which hides the bucketed sort-merge path this test is about (at
    // real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join AND the same-key aggregate must consume the bucket layout
    // directly — a single shuffle anywhere means bucketing was ignored.
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it computes the right thing
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
    assert(joined.count() == expected.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      dropHard("li_bucketed")
      dropHard("o_bucketed")
    }
  }
}
