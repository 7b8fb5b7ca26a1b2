package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TPC-H-shaped relational coverage over the driver's testdata.
  *
  * Every query has a DuckDB oracle (SURVEY.md §5 / the driver contract), so
  * column names and row order are pinned on both sides. Scale notes:
  *  - dimension tables (region/nation, and supplier/part at low SF) are
  *    broadcast — either explicitly for the always-tiny ones or left to
  *    AQE's size-based broadcast for the SF-scaled ones;
  *  - aggregates are expressed declaratively so Catalyst plans partial
  *    (map-side) aggregation before the shuffle;
  *  - double-typed aggregates are rounded identically on both sides to
  *    make the hash compare stable across summation orders.
  */
object RelationalQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** The MERGE resolution plan for q70 (exposed for PlanAuditSpec): both
    * sides compact with one window keyed on the merge key, then a single
    * keyed FULL OUTER join resolves matched/not-matched — the canonical
    * physical shape lakehouse MERGE lowers to.
    */
  private[graft] def mergeUpsertLog(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val wKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val tgt = events(s, d).filter(col("ts") <= cutoff)
      .withColumn("rn", row_number().over(wKey)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("t_id"), col("value").as("t_value"))
    val src = events(s, d).filter(col("ts") > cutoff)
      .withColumn("rn", row_number().over(wKey)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("s_id"), col("value").as("s_value"),
        (col("event_id") % 19 === 0).as("tomb"))
    tgt.join(src, Seq("user_id", "event_type"), "full_outer")
      .withColumn("action",
        when(col("s_id").isNull, "keep")
          .when(col("tomb") && col("t_id").isNotNull, "delete")
          .when(col("tomb"), "skip") // NOT MATCHED + tombstone: no-op
          .when(col("t_id").isNotNull, "update")
          .otherwise("insert"))
      .filter(col("action") =!= "skip")
      .select(col("user_id"), col("event_type"), col("action"),
        when(col("s_id").isNull, col("t_id")).otherwise(col("s_id"))
          .as("event_id"),
        when(col("s_id").isNull, col("t_value")).otherwise(col("s_value"))
          .as("value"))
  }

  /** q71's merge plan (exposed for PlanAuditSpec): deterministic synthetic
    * VCF target (20k rows over chr0..chr3) merged with a delta of 3k
    * updates (each with a stale + final version, compacted by ONE window
    * keyed on the merge key (chrom,pos)), 300 of them tombstones, plus 3k
    * inserts — resolved by a single keyed FULL OUTER join, exactly the
    * q70 lakehouse-MERGE physical shape. Returns the live merged rows in
    * the VCF sink schema.
    */
  private[graft] def indexedMergeRows(s: SparkSession): DataFrame = {
    val n = 5000L
    val tgt = s.range(0, 4 * n).select(
      concat(lit("chr"), (col("id") / n).cast("long").cast("string")).as("chrom"),
      ((col("id") % n) * 100 + 1).as("pos"),
      (col("id") % 50).cast("double").as("qual"))
    val updKeys = s.range(0, 3000).select(
      concat(lit("chr"), ((col("id") * 5) / n).cast("long").cast("string")).as("chrom"),
      (((col("id") * 5) % n) * 100 + 1).as("pos"),
      col("id").as("j"))
    val updStale = updKeys.select(col("chrom"), col("pos"),
      lit(-1.0).as("qual"), lit("update").as("op"), lit(0).as("seq"))
    val updFinal = updKeys.select(col("chrom"), col("pos"),
      (lit(50) + col("j") % 25).cast("double").as("qual"),
      when(col("j") % 10 === 0, "delete").otherwise("update").as("op"),
      lit(1).as("seq"))
    val ins = s.range(0, 3000).select(
      concat(lit("chr"), (col("id") % 4).cast("string")).as("chrom"),
      (lit(500001L) + (col("id") / 4).cast("long") * 100).as("pos"),
      (lit(10) + col("id") % 40).cast("double").as("qual"),
      lit("insert").as("op"), lit(0).as("seq"))
    val wKey = Window.partitionBy(col("chrom"), col("pos"))
      .orderBy(col("seq").desc)
    val delta = updStale.union(updFinal).union(ins)
      .withColumn("rn", row_number().over(wKey)).filter(col("rn") === 1)
      .select(col("chrom"), col("pos"), col("qual").as("d_qual"), col("op"))
    tgt.join(delta, Seq("chrom", "pos"), "full_outer")
      .withColumn("action", coalesce(col("op"), lit("keep")))
      .filter(col("action") =!= "delete")
      .select(
        col("chrom"), col("pos"),
        lit(null).cast("array<string>").as("id"),
        lit("A").as("ref"), array(lit("G")).as("alt"),
        coalesce(col("d_qual"), col("qual")).cast("float").as("qual"),
        array(lit("PASS")).as("filter"), lit("AC=1").as("info"),
        lit(null).cast("string").as("formats"))
  }

  val queries: Map[String, Q] = Map(
    // Q1: full-scan aggregate; map-side combine then 6-group shuffle.
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q3: 3-way join narrowed by selective dimension filters first.
    "q03_shipping_priority" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
    }),

    // Q5: 6-way star join; region/nation broadcast explicitly (always tiny).
    "q05_local_supplier_volume" -> ((s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6: pure scan + filter + scalar agg; filters must reach the parquet scan.
    "q06_forecast_revenue" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.03, 0.07) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // Q4-shape: EXISTS → left-semi join, then count per priority.
    "q04_order_priority" -> ((s, d) => {
      val l = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q10-shape: returned-item revenue per customer.
    "q10_returned_items" -> ((s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14-shape: conditional aggregation over a part join.
    "q14_promo_effect" -> ((s, d) => {
      val l = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      l.join(part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) *
            sum(when(col("p_type") === "PROMO", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .otherwise(lit(0.0))) /
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("promo_revenue"))
    }),

    // Q18-shape: HAVING over a grouped join (large-quantity orders).
    "q18_large_orders" -> ((s, d) => {
      val bigOrders = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("tot_qty"))
        .filter(col("tot_qty") > 150)
      orders(s, d)
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), round(col("tot_qty"), 2).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Window function: top-3 lineitems per supplier by price.
    "q20_window_topk_per_supplier" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      lineitem(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    // Rollup with NULL-safe labels (identical COALESCE on both sides).
    "q21_rollup_revenue" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_price"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Q19-shape: OR-of-ANDs join predicate (brand/size/quantity bands).
    // The disjunction references both sides, so it can't fully push into
    // either scan — the plan must still broadcast the small part side and
    // evaluate the residual inside the join, not expand to a cartesian.
    "q34_disjunctive_bands" -> ((s, d) => {
      lineitem(s, d).join(part(s, d),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#14" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 40))))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Q21-shape: suppliers who were the ONLY late shipper in a
    // multi-supplier order (late = shipped >90 days after the order date).
    // EXISTS -> left-semi on (same order, other supplier); NOT EXISTS ->
    // left-anti on (same order, other LATE supplier). Both correlations
    // are keyed on l_orderkey, so they plan as keyed joins.
    "q35_suppliers_kept_waiting" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      val l = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val lateOthers = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      late
        .join(others, col("l_orderkey") === col("k2") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(lateOthers, col("l_orderkey") === col("k3") && col("s3") =!= col("l_suppkey"),
          "left_anti")
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22-shape: scalar-subquery threshold + counting correlation. The
    // global average is a 1-row aggregate broadcast into the filter
    // (crossJoin of a single row — no shuffle of the fact side); then
    // customers above it with fewer than 5 orders, grouped per nation.
    // (The testdata gives every customer at least one order, so the pure
    // anti-join variant is vacuous; the count form keeps the correlated
    // shape AND nonempty results at every SF.)
    "q36_rich_inactive_customers" -> ((s, d) => {
      val thr = customer(s, d).filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("thr"))
      val oc = orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      customer(s, d)
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .filter(coalesce(col("n_orders"), lit(0L)) < 5)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("n_name"))
    }),

    // Anti join: customers that never ordered.
    "q22_customers_no_orders" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Q13-shape: order-count distribution over customers (left join so
    // zero-order customers land in bucket 0).
    "q13_customer_distribution" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15-shape: suppliers achieving the max quarterly revenue. Revenue is
    // accumulated in exact decimal and compared as integer cents — a
    // max-equality on rounded doubles would be engine-dependent at ties.
    "q15_top_supplier" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg((round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2) * 100).cast("long").as("revenue_cents"))
      val top = rev.agg(max(col("revenue_cents")).as("max_cents"))
      supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(top), col("revenue_cents") === col("max_cents"))
        .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17-shape: lines ordering far below their part's average quantity.
    // The 20%-of-average comparison is done in exact integer-free form:
    // qty * 5 * n < sum(qty), all in decimal, so both engines agree at
    // the boundary.
    "q17_small_qty_revenue" -> ((s, d) => {
      val stats = lineitem(s, d)
        .groupBy(col("l_partkey").as("sp_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("sum_qty"),
          count(lit(1)).as("n_qty"))
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1")
        .join(stats, col("l_partkey") === col("sp_partkey"))
        .filter(col("l_quantity").cast("decimal(18,6)") * 5 * col("n_qty") <
          col("sum_qty"))
        .agg(count(lit(1)).as("n_lines"),
          (round(sum(col("l_extendedprice").cast("decimal(18,6)")), 2) * 100)
            .cast("long").as("revenue_cents"))
    }),

    // Events: sessionization (gaps-and-islands, 30-minute inactivity
    // timeout). Both windows are keyed on user_id — no global sort, the
    // classic scale-safe shape; ties on ts are ordered by event_id so the
    // lag is deterministic. Micros (ts is µs-truncated by Tables.events)
    // keep the gap comparison integral in both engines.
    "q33_event_sessions" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val flagged = events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"))
        .filter(col("n_sessions") >= 2)
        .orderBy(col("user_id"))
    }),

    // Events: per-type hourly aggregate (timestamp truncation parity via date+hour).
    "q30_events_hourly" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .filter(col("n") >= 2)
        .orderBy(col("event_type"), col("day"), col("h"))
    }),

    // Events: top-25 users by total purchase value. Scale note: the window's
    // ORDER BY (total DESC, user_id) is a total order, so rank == row_number;
    // we take the top 25 with a distributed TakeOrderedAndProject first and
    // only then run the (now 25-row) global window — no single-partition
    // shuffle of the full user set.
    "q31_events_user_rank" -> ((s, d) => {
      val totals = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("total"), count(lit(1)).as("n_purchases"))
        .orderBy(col("total").desc, col("user_id"))
        .limit(25)
      totals
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("total").desc, col("user_id")))
            .cast("long"))
        .select(col("rnk"), col("user_id"), col("total"), col("n_purchases"))
        .orderBy(col("rnk"))
    }),

    // Q7-shape: volume between two nations by year (supplier vs customer
    // nation join through lineitem/orders; year bucketing).
    "q07_volume_shipping" -> ((s, d) => {
      val n = nation(s, d).select(col("n_nationkey"), col("n_name"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .join(broadcast(n.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        // exact decimal accumulation + integer-cent output: these groups are
        // large enough that double rounding at the 2-decimal boundary
        // diverges between engines
        .agg((round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2) * 100).cast("long").as("revenue_cents"))
        .filter(col("revenue_cents") > 5000000L)
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8-shape: market share of one part type per year.
    "q08_market_share" -> ((s, d) => {
      val joined = lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      joined.groupBy(col("o_year"))
        .agg(round(
          sum(when(col("p_type") === "PROMO", col("volume")).otherwise(lit(0.0))) /
            sum(col("volume")), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9-shape: profit by supplier nation and year.
    "q09_product_profit" -> ((s, d) => {
      lineitem(s, d)
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("l_quantity") * lit(10.0)), 2).as("profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // Set op: distinct nations present on either side of trade, minus ASIA.
    "q32_setops_nations" -> ((s, d) => {
      val n = nation(s, d)
      val custN = customer(s, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      val suppN = supplier(s, d).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      val asiaN = n.join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"))
      custN.union(suppN).distinct().except(asiaN)
        .orderBy(col("n_name"))
    }),

    // Q2-shape: correlated min subquery — for each small part, every
    // supplier whose offer price equals that part's minimum. The per-part
    // min is a keyed aggregate joined back on (partkey, exact price);
    // equality is on a RAW column value, so double summation order can't
    // perturb the match.
    "q37_min_cost_supplier" -> ((s, d) => {
      val offers = lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      val minc = offers.groupBy(col("l_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
        .withColumnRenamed("l_partkey", "min_partkey")
      offers
        .join(minc, col("l_partkey") === col("min_partkey") &&
          col("l_extendedprice") === col("min_price"))
        .drop("min_partkey")
        .join(part(s, d).filter(col("p_size") < 10), col("l_partkey") === col("p_partkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          round(col("min_price"), 2).as("min_price"))
        .distinct()
        .orderBy(col("p_partkey"), col("s_name"))
    }),

    // Q11-shape: HAVING against a fraction of the GLOBAL aggregate — the
    // per-supplier values shuffle once; the global total is a 1-row
    // broadcast, never a second pass over lineitem.
    "q38_important_suppliers" -> ((s, d) => {
      val rev = lineitem(s, d).groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("value"))
      // 1.1x the mean keeps the fraction-of-global shape AND a non-empty
      // result at every SF (a fixed permille empties out as N grows)
      val thr = rev.agg((avg(col("value")) * lit(1.1)).as("thr"))
      rev.crossJoin(broadcast(thr))
        .filter(col("value") > col("thr"))
        .select(col("l_suppkey"), round(col("value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_suppkey"))
    }),

    // Q12-shape: conditional aggregation (CASE WHEN inside sum) over a
    // date-bounded join, split by priority class.
    "q39_priority_shipping" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q16-shape: count(DISTINCT) per attribute pair with a NOT IN
    // supplier exclusion (left-anti join — never a nullable NOT IN trap).
    "q40_supplier_cnt" -> ((s, d) => {
      val excluded = supplier(s, d).filter(col("s_acctbal") < 1000)
        .select(col("s_suppkey"))
      lineitem(s, d)
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(part(s, d).filter(col("p_size").isin(1, 5, 10, 15, 20)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    // Pure range join (no equi key): each purchase joined to all clicks in
    // the strictly-preceding hour, across ALL users. Spark's planner can
    // only express `c.ts BETWEEN p.ts - 1h AND p.ts` as a broadcast-
    // nested-loop O(n*m); banding by the window width W turns it into a
    // keyed equi-join — every click lands in band ts div W, every probe
    // window [p-W, p) spans exactly bands (p div W - 1, p div W), so the
    // probe side is replicated 2x and joined on band, with the exact range
    // check as a post-join filter. One shuffle, per-task work proportional
    // to band population (band width = window width bounds replication at
    // 2x regardless of data volume; sub-salt a hot band if event time is
    // heavily clustered). PlanAuditSpec asserts no nested-loop join
    // survives in the physical plan.
    "q41_range_join_banded" -> ((s, d) => {
      val W = 3600000000L // 1 hour in microseconds = band width
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), unix_micros(col("ts")).as("pus"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("cus"), col("value"))
        .withColumn("band", expr(s"cus div $W"))
      purchases
        .withColumn("band",
          explode(array(expr(s"pus div $W - 1"), expr(s"pus div $W"))))
        .join(clicks, "band")
        .filter(col("cus") >= col("pus") - W && col("cus") < col("pus"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks"),
          round(sum(col("value")), 2).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // As-of join (latest click strictly before each purchase, per user)
    // with ZERO joins: union both event kinds, one shuffle on user_id, and
    // a range-frame window carries the latest prior click's timestamp
    // forward (rangeBetween excludes same-instant rows, so the strict
    // `c.ts < p.ts` semantics match DuckDB's native ASOF JOIN oracle
    // exactly). The pairwise-join formulation would shuffle clicks AND
    // purchases into a join then re-aggregate to pick the max — this shape
    // touches each row once and scales with |events|, not |pairs|.
    "q42_asof_join" -> ((s, d) => {
      val ev = events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("click_us",
          last(when(col("event_type") === "click", col("us")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("click_us").isNotNull)
        .select(col("event_id"), (col("us") - col("click_us")).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Pivot (wide-table reshaping): daily event counts, one column per event
    // type. The EXPLICIT value list matters at scale: without it Spark first
    // runs a distinct-values discovery job over the full input; with it the
    // whole pivot is one map-side-combinable aggregate — a single shuffle of
    // (day -> 5 counters), never the raw events.
    "q43_pivot_events" -> ((s, d) => {
      events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("day"), col("click").as("n_click"), col("error").as("n_error"),
          col("purchase").as("n_purchase"), col("signup").as("n_signup"),
          col("view").as("n_view"))
        .orderBy(col("day"))
    }),

    // Grouping sets (non-hierarchical multi-aggregate): per-returnflag AND
    // per-linestatus AND grand totals in ONE pass — Catalyst's Expand feeds
    // all three groupings through a single map-side-combinable shuffle,
    // where three separate aggregates would scan lineitem three times.
    // Cents-exact like q07 (double rounding at the 2-decimal boundary
    // diverges between engines on groups this large).
    "q44_grouping_sets" -> ((s, d) => {
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg((round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2) * 100).cast("long").as("revenue_cents"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("revenue_cents"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Bloom semi-join pruning — the 100 TB join pattern when the build side
    // is too big to broadcast but its KEY SET still fits a sketch: one
    // aggregate builds a bloom filter over the build keys (~1.2 MB per 1M
    // keys at 1% fpp), it broadcasts, and probe rows drop BEFORE the shuffle
    // join. False positives are eliminated by the exact join that follows,
    // so the answer is identical to the plain join (the oracle IS the plain
    // join) — the bloom only cuts the probe side's shuffle volume. Spark's
    // own runtime bloom injection does this adaptively; the explicit form
    // works when the build side comes from outside the query (e.g. an
    // allowlist computed by an earlier pipeline stage).
    "q45_bloom_semijoin_prune" -> ((s, d) => {
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      // Capacity from the actual build-side count so FPP holds at any scale
      // (a fixed capacity degrades silently once the key set outgrows it).
      val buildN = math.max(bigOrders.count(), 1000L)
      val bfB = s.sparkContext.broadcast(
        bigOrders.stat.bloomFilter("o_orderkey", buildN, 0.01))
      val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
      lineitem(s, d)
        .filter(mightContain(col("l_orderkey")))
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg((round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2) * 100).cast("long").as("revenue_cents"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Incremental rollup (the 100 TB ETL identity): a daily pre-aggregate is
    // computed once, persisted, and coarser windows re-aggregate the SMALL
    // daily table instead of rescanning raw events — valid because counts
    // and integer cents are monoids (per-row cents fixed BEFORE summing, so
    // partial sums re-associate exactly; a post-sum rounding would not).
    // The oracle aggregates raw events directly: daily->monthly must be
    // byte-identical to straight monthly.
    "q46_incremental_rollup" -> ((s, d) => {
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          (round(col("value").cast("decimal(18,6)"), 2) * 100)
            .cast("long").as("cents"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("value_cents"))
      daily
        .groupBy(trunc(col("day"), "MM").as("month"), col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("value_cents")).as("value_cents"))
        .orderBy(col("month"), col("event_type"))
    }),

    // Interval OVERLAP join — the genomics-join shape (variable-length
    // intervals, unlike q41's fixed time band). Each event is an interval
    // [ts, ts + (floor(value)+1) minutes); purchases join views of the same
    // user whose intervals overlap. The naive plan is a per-user cartesian
    // with a range predicate; the scalable plan explodes each interval into
    // the 1-hour bands it covers and equi-joins on (user_id, band) — join
    // fan-out is bounded by interval length / band width (<=9 here), and a
    // pair sharing several bands is counted once by assigning it to the band
    // containing the overlap start (both sides necessarily cover it). At
    // 100 TB this is a pure keyed shuffle; no range-predicate nested loop.
    "q47_interval_overlap_join" -> ((s, d) => {
      val W = 3600000000L // 1-hour bands, microseconds
      val iv = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) +
            (floor(col("value")).cast("long") + 1L) * 60000000L).as("e0"))
      def banded(df: DataFrame, p: String) = df
        .withColumn("band",
          explode(sequence(expr(s"s0 div $W"), expr(s"(e0 - 1) div $W"))))
        .select(col("event_id").as(s"${p}_id"), col("user_id"),
          col("s0").as(s"${p}s"), col("e0").as(s"${p}e"), col("band"))
      val p = banded(iv.filter(col("event_type") === "purchase"), "p")
      val v = banded(iv.filter(col("event_type") === "view"), "v")
        .withColumnRenamed("user_id", "v_user")
        .withColumnRenamed("band", "v_band")
      p.join(v, col("user_id") === col("v_user") &&
          col("band") === col("v_band") &&
          col("ps") < col("ve") && col("vs") < col("pe"))
        .filter(col("band") === expr(s"greatest(ps, vs) div $W"))
        .groupBy(col("p_id").as("event_id"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("pe"), col("ve")) - greatest(col("ps"), col("vs")))
            .as("overlap_us"))
        .orderBy(col("event_id"))
    }),

    // Sweep-line coverage depth (pileup shape): max number of concurrently
    // open 'view' intervals per user. Each interval becomes two boundary
    // events (+1 at start, -1 at end); a per-user ordered cumulative sum is
    // the depth profile. Orders by (pos, delta) so a close at t sorts before
    // an open at t (half-open intervals). Scales as one explode (2x rows) +
    // one keyed window — never materializes per-position coverage; at 100 TB
    // the partition key (user / chromosome) bounds each in-memory sort.
    "q48_coverage_sweep" -> ((s, d) => {
      val b = events(s, d).filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) +
            (floor(col("value")).cast("long") + 1L) * 60000000L).as("e0"))
        .select(col("user_id"), explode(array(
          struct(col("s0").as("pos"), lit(1).as("d")),
          struct(col("e0").as("pos"), lit(-1).as("d")))).as("ev"))
        .select(col("user_id"), col("ev.pos").as("pos"), col("ev.d").as("d"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("pos"), col("d"))
      b.withColumn("depth", sum(col("d")).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("depth")).as("max_concurrent"),
          sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_intervals"))
        .orderBy(col("user_id"))
    }),

    // HyperLogLog++ cardinality — THE 100 TB distinct-count operator (an
    // exact countDistinct shuffles every distinct key; the sketch is a
    // fixed few KB per partition, merged without a key shuffle). Sketches
    // are engine-specific, so the gate pins the exact counts and asserts
    // the approximation lands inside its configured 5% error envelope —
    // the property that actually matters for planning at scale.
    "q49_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_orderkey")).as("n_orders_exact"),
        countDistinct(col("l_partkey")).as("n_parts_exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("a_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("a_parts"))
        .select(col("n_orders_exact"), col("n_parts_exact"),
          (abs(col("a_orders") - col("n_orders_exact")) <=
            col("n_orders_exact") * 0.05).as("orders_within_5pct"),
          (abs(col("a_parts") - col("n_parts_exact")) <=
            col("n_parts_exact") * 0.05).as("parts_within_5pct"))),

    // Explicit key-salting for a skewed shuffle join — the manual fix when
    // AQE's skew split can't help (e.g. the skew is in the JOIN KEY's hash
    // bucket, or the engine predates runtime re-plan): the probe side gets
    // a deterministic per-row salt, the build side replicates 16x with
    // every salt value, and the join key becomes (key, salt) so one hot
    // user spreads over 16 tasks instead of one straggler. SHUFFLE_MERGE
    // hint keeps the demonstration honest (a broadcast would hide the
    // skew problem entirely — and is the right fix when the dim is small).
    // Decimal sums keep the aggregate exact, so the answer is
    // byte-identical to the oracle's plain un-salted join.
    "q50_salted_skew_join" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          (col("event_id") % 16L).as("salt"))
      val dim = customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0L), lit(15L))))
      ev.hint("SHUFFLE_MERGE")
        .join(dim, ev("user_id") === dim("c_custkey") && ev("salt") === dim("salt"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),

    // Events: trailing time-RANGE window (rolling-rate / rate-limiter
    // shape). A ROWS frame counts a fixed number of rows; the 1-hour
    // RANGE frame is value-based — each row's frame is [ts - 1h, ts]
    // however many events landed in it, so a burst shows up as a high
    // trailing count. Both window aggregates share ONE pass keyed on
    // user_id (per-user sort only, never a global sort), then a plain
    // keyed aggregate takes the per-user peaks. The windowed sum runs
    // over decimals so it is exact and order-independent — the peak row
    // chosen by max() is then engine-independent too.
    "q51_trailing_range_window" -> ((s, d) => {
      events(s, d)
        .select(col("user_id"), col("ts"), col("value"))
        .selectExpr(
          "user_id",
          "count(*) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN" +
            " INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS c1h",
          "sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id" +
            " ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND" +
            " CURRENT ROW) AS s1h")
        .groupBy(col("user_id"))
        .agg(max(col("c1h")).as("peak_1h_events"),
          round(max(col("s1h")), 2).cast("double").as("peak_1h_value"))
        .orderBy(col("user_id"))
    }),

    // Events: funnel conversion (signup -> click -> purchase by strict
    // first-occurrence order). The naive funnel is k-1 self-joins on
    // user_id — k-1 corpus-sized shuffles; here ONE keyed aggregate
    // computes each user's first ts per stage via conditional min, and a
    // 1-row rollup counts survivors, so the event log is scanned exactly
    // once no matter how many stages the funnel has.
    "q52_funnel_conversion" -> ((s, d) => {
      val firsts = events(s, d).groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t1"),
        min(when(col("event_type") === "click", col("ts"))).as("t2"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t3"))
      firsts.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("t2") > col("t1"), 1L).otherwise(0L)).as("n_signup_click"),
        sum(when(col("t2") > col("t1") && col("t3") > col("t2"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
    }),

    // Events: CDC log compaction (last-write-wins upsert). The change-log
    // shape every ingest pipeline needs: many updates per (user, type)
    // key, only the latest version survives. row_number() over a window
    // KEYED on the upsert key (ties broken by event_id so replays are
    // deterministic) — per-key sorts run in parallel, no global sort, and
    // at 100 TB this is exactly one shuffle by the compaction key. The
    // survivors are then rolled up per type so the gate output is stable.
    "q53_cdc_compaction" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_live_keys"),
          round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
            .as("sum_live_value"),
          sum(col("event_id")).as("sum_live_ids"))
        .orderBy(col("event_type"))
    }),

    // Events: sliding 7-day distinct users (the WAU/DAU dashboard shape).
    // The naive plan keeps a distinct-user set per window — a set union
    // per day over every user at 100 TB. The scalable EXACT shape inverts
    // it: dedup to (user, active-day) first (one keyed shuffle with
    // map-side combine — the only corpus-sized step), explode each active
    // day into the <= 7 windows it serves, dedup (user, window), and
    // count. Bounded 7x growth on the already-tiny activity table; every
    // step is a keyed aggregate, no per-window distinct state.
    "q54_sliding_wau" -> ((s, d) => {
      val active = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      active
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("win_end"))
        .distinct()
        .groupBy(col("win_end")).agg(count(lit(1)).as("wau"))
        .orderBy(col("win_end"))
    }),

    // Mergeable quantile sketch vs exact percentiles (companion to q49's
    // HLL gate): approx_percentile is the one-pass, map-side-mergeable
    // sketch you'd actually run at 100 TB; the exact interpolated
    // percentile anchors the oracle and bounds the sketch error at 1%.
    "q55_approx_quantile" -> ((s, d) =>
      lineitem(s, d).agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50_exact"),
        round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99_exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("a99"))
      .select(col("p50_exact"), col("p99_exact"),
        (abs(col("a50") - col("p50_exact")) <= col("p50_exact") * 0.01)
          .as("p50_within_1pct"),
        (abs(col("a99") - col("p99_exact")) <= col("p99_exact") * 0.01)
          .as("p99_within_1pct"))),

    // Events: cumulative-unique-users growth curve. Exact running
    // distincts without running-distinct state: each user collapses to
    // their FIRST active day (one keyed aggregate — the only corpus-sized
    // step), and the cumulative sum runs over the tiny per-day new-user
    // table. The corpus never enters a window.
    "q56_user_growth" -> ((s, d) => {
      val firstDay = events(s, d)
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
      val newPerDay = firstDay.groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      newPerDay
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy(col("day"))
    }),

    // Events: retention cohort triangle (users grouped by signup day,
    // tracked by week offset). The corpus collapses to distinct
    // (user, week) activity plus a per-user cohort day — two keyed
    // aggregates and ONE user-keyed join; the cohort matrix itself is
    // tiny. No per-cohort scans, no window over the corpus.
    "q57_retention_cohorts" -> ((s, d) => {
      val activity = events(s, d)
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
            .cast("long").as("week"))
        .distinct()
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      activity.join(cohort, Seq("user_id"))
        .withColumn("offset", col("week") - col("cohort_week"))
        .groupBy(col("cohort_week"), col("offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("offset"))
    }),

    // Events: SCD2 history reconstruction from the change log — each
    // (user, type) version gets a validity interval [ts, next ts), the
    // companion of q53's latest-only compaction. One lead() window keyed
    // on the dimension key (parallel per-key sorts, no global order),
    // then a keyed rollup; open (current) versions count NULL valid_to.
    "q58_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(when(col("valid_to").isNotNull,
            unix_micros(col("valid_to")) - unix_micros(col("ts")))
            .otherwise(0L)).as("sum_validity_us"))
        .orderBy(col("event_type"))
    }),

    // Referential-integrity audit (the ETL data-quality gate): orphan
    // counts via anti-joins on each foreign key. Anti-joins shuffle keyed
    // on the FK (or broadcast when the parent is small — Catalyst picks);
    // the three audits run as three independent 1-row aggregates
    // combined by cross joins of singletons.
    "q59_fk_orphan_audit" -> ((s, d) => {
      val orphanLi = lineitem(s, d).join(orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      val orphanOrd = orders(s, d).join(customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_orders"))
      val orphanEv = events(s, d).join(customer(s, d),
          col("user_id") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_events"))
      orphanLi.crossJoin(orphanOrd).crossJoin(orphanEv)
    }),

    // Z-order (Morton) clustering audit — the lakehouse layout op for
    // 2-D data skipping: interleaving the bits of (user, day) gives a
    // 1-D sort key whose ranges stay LOCAL in both dimensions, so
    // min/max parquet footer stats prune on either predicate. At 100 TB
    // the write is repartitionByRange(zkey) + sortWithinPartitions; this
    // gate pins the key arithmetic (pure integer bit-spreading, same
    // value in any engine) and audits per-bucket extents — small
    // per-bucket (max-min) spans in BOTH dims is exactly the property
    // that makes the layout skip.
    "q60_zorder_extents" -> ((s, d) => {
      def spread(x: String): String = {
        val a = s"($x & 255)"
        val b = s"(($a | shiftleft($a, 4)) & 3855)"
        val c = s"(($b | shiftleft($b, 2)) & 13107)"
        s"(($c | shiftleft($c, 1)) & 21845)"
      }
      events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("dayi"))
        .withColumn("zkey",
          expr(s"${spread("user_id")} + 2 * ${spread("dayi")}"))
        .withColumn("zbucket", expr("zkey div 64"))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          (max(col("user_id")) - min(col("user_id"))).as("user_span"),
          (max(col("dayi")) - min(col("dayi"))).as("day_span"))
        .orderBy(col("zbucket"))
    }),

    // Heavy hitters via a Misra-Gries candidate pass + exact confirm — the
    // mergeable-summary shape for key spaces too large to groupBy outright.
    // Each partition streams through a capacity-128 MG summary; by the
    // pigeonhole argument over partition totals, any key with GLOBAL count
    // > N/128 must survive in at least one partition's summary, so the tiny
    // candidate union (≤ 128/partition) is a guaranteed superset. Phase 2
    // computes EXACT counts restricted to candidates via a broadcast
    // semi-join and applies the threshold with integer math (cnt*128 > N).
    // At 100 TB with ~1e11 distinct keys the full-cardinality shuffle never
    // happens: only candidates and their exact counts move. The final
    // output is partition-layout-independent because the confirm pass is
    // exact and the MG guarantee is one-sided (superset).
    "q61_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val k = 128
      val uid = events(s, d).select(col("user_id")).as[Long]
      val cands = uid.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[Long, Long]
        it.foreach { u =>
          if (m.contains(u)) m(u) += 1L
          else if (m.size < k) m(u) = 1L
          else { // MG decrement step: new key absorbed by decrementing all
            m.mapValuesInPlace((_, c) => c - 1L)
            m.filterInPlace((_, c) => c > 0L)
          }
        }
        m.keysIterator
      }.toDF("user_id").distinct()
      val total = events(s, d).agg(count(lit(1)).as("n_total"))
      events(s, d).join(broadcast(cands), Seq("user_id"), "left_semi")
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * k > col("n_total"))
        .select(col("user_id"), col("cnt"))
        .orderBy(col("user_id"))
    }),

    // EXACT range-partition split points (equi-depth histogram bounds) —
    // what repartitionByRange only approximates by sampling. The corpus
    // collapses to a per-value histogram first (ONE keyed aggregate with
    // map-side combine), the cumulative window then runs over the DISTINCT
    // values only, and the 7 bucket targets join back as a 7-row broadcast.
    // At 100 TB with a near-unique double column the histogram pre-buckets
    // to a fixed-width grid first (two-level, the l24 discipline); here the
    // value column's distinct count is already bounded. bound_i = smallest
    // value whose cumulative count reaches ceil(i*N/8) — integer-exact on
    // both engines because cum >= ceil(x) ⟺ 8*cum >= i*N.
    "q62_range_bounds" -> ((s, d) => {
      val ev = events(s, d).select(col("value"))
      val hist = ev.groupBy(col("value")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(w))
      val targets = ev.agg(count(lit(1)).as("n"))
        .select(explode(expr("sequence(1L, 7L)")).as("i"), col("n"))
      cum.join(broadcast(targets), col("cum") * 8 >= col("i") * col("n"))
        .groupBy(col("i")).agg(min(col("value")).as("bound"))
        .orderBy(col("i"))
    }),

    // Dynamic partition pruning over the engine's OWN lakehouse layout:
    // events re-land hive-partitioned by event_type, and a star join
    // against a filtered dimension must prune partitions at RUNTIME (the
    // dim filter isn't knowable at plan time). This is the layout+join
    // shape that makes a 100 TB fact table affordable: only the dim's
    // surviving keys' directories are listed and scanned. PlanAuditSpec
    // asserts the scan carries a dynamicpruning subquery filter. The
    // write is a one-time idempotent gate fixture (skipped when present);
    // results are graded against DuckDB on the raw table.
    "q63_dpp_prune" -> ((s, d) => {
      import s.implicits._
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_gate_dpp_${d.replaceAll("[^a-zA-Z0-9]", "_")}")
      val dimDir = new java.io.File(dir, "dim")
      val factDir = new java.io.File(dir, "fact")
      if (!new java.io.File(factDir, "_SUCCESS").exists()) {
        events(s, d).write.mode("overwrite")
          .partitionBy("event_type").parquet(factDir.getAbsolutePath)
        // the dim must be file-based: a LocalRelation dim folds its filter
        // at plan time and the PartitionPruning rule then sees no
        // selective predicate to build the DPP subquery from
        Seq(("click", 10L), ("purchase", 500L), ("view", 1L),
          ("signup", 50L), ("error", 0L)).toDF("event_type", "weight")
          .coalesce(1).write.mode("overwrite").parquet(dimDir.getAbsolutePath)
      }
      val fact = s.read.parquet(factDir.getAbsolutePath)
      val dim = s.read.parquet(dimDir.getAbsolutePath)
      fact.join(dim.filter(col("weight") >= 10L), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") * col("weight")), 2).as("weighted"))
        .orderBy(col("event_type"))
    }),

    // Market-basket co-occurrence with lift: part pairs ordered together
    // at support >= 3, scored by integer-exact lift permille. ONE shuffle
    // builds per-order baskets (collect_set keyed on l_orderkey — the
    // aggregation buffer holds one order's distinct parts, linear in
    // basket width, never quadratic); baskets wider than maxBasket (32;
    // TPC-H maxes at 7, so nothing is dropped here) are excluded from
    // mining and surfaced in n_overflow_orders, so one hot basket cannot
    // explode a task at skewed 100 TB scale. Pair generation is then a
    // MAP-side double explode over the capped arrays (≤ 32²/2 pairs per
    // order, no self-join, no cartesian); tot/ovf/pcnt all reuse the one
    // basket exchange. Order total and overflow count are 1-row
    // broadcasts; per-part counts join the tiny post-support pair set,
    // not the raw pairs.
    "q64_part_cooccurrence" -> ((s, d) => {
      val maxBasket = 32
      // lineage-cut: three consumers (overflow scalar, part counts, pair
      // join) otherwise each re-run the full lineitem scan + basket
      // shuffle — at sf1 that tripled the heaviest stage and its rep
      // variance (memory pressure from three concurrent basket builds).
      // Materialization mode is a CONSCIOUS choice (same idiom as l30's
      // star contraction): localCheckpoint blocks live only on executors
      // with no lineage, so on a real cluster (dynamic allocation, spot
      // nodes) an executor loss makes the baskets unrecoverable — set
      // spark.graft.checkpointDir to an HDFS/object-store path there and
      // the cut becomes a RELIABLE checkpoint instead. Default stays
      // localCheckpoint for the single-JVM bench, where executor loss is
      // process death anyway and the reliable write would only add IO.
      val basketsLineage = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
      val ckptDir = s.conf.getOption("spark.graft.checkpointDir")
      val baskets = ckptDir match {
        case Some(dir) =>
          s.sparkContext.setCheckpointDir(dir)
          basketsLineage.checkpoint()
        case None => basketsLineage.localCheckpoint()
      }
      // overflow count + kept-order total in ONE scalar aggregate (one
      // 1-row broadcast instead of two, one fewer basket recomputation)
      val totOvf = baskets.agg(
        sum(when(size(col("parts")) <= maxBasket, 1L).otherwise(0L))
          .as("n_orders_total"),
        sum(when(size(col("parts")) > maxBasket, 1L).otherwise(0L))
          .as("n_overflow_orders"))
      val kept = baskets.filter(size(col("parts")) <= maxBasket)
      val pcnt = kept.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("pc"))
      kept.select(explode(col("parts")).as("pa"), col("parts"))
        .select(col("pa"), explode(col("parts")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 3)
        .join(pcnt.select(col("pk").as("pa"), col("pc").as("ca")), Seq("pa"))
        .join(pcnt.select(col("pk").as("pb"), col("pc").as("cb")), Seq("pb"))
        .crossJoin(broadcast(totOvf))
        .select(col("pa"), col("pb"), col("n_orders"), col("ca"), col("cb"),
          expr("(1000 * n_orders * n_orders_total) div (ca * cb)")
            .as("lift_permille"),
          col("n_overflow_orders"))
        .orderBy(col("n_orders").desc, col("pa"), col("pb"))
    }),

    // Day-over-day DAU RECONCILIATION — the FULL OUTER join surface
    // (absent from every other query): today's distinct-user set outer-
    // joined against yesterday's (shifted by one day) on (user_id, day),
    // so one-sided users survive the join and classify as new (today
    // only) / churned (yesterday only) / retained (both); per-day
    // conditional rollup. Keyed on (user, day) throughout — at scale the
    // shifted self-join is one co-partitioned shuffle.
    "q69_reconciliation" -> ((s, d) => {
      val du = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val bounds = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val today = du.withColumn("present_today", lit(1))
      val yesterday = du
        .select(col("user_id"), date_add(col("day"), 1).as("day"),
          lit(1).as("present_yday"))
      today.join(yesterday, Seq("user_id", "day"), "full_outer")
        .crossJoin(broadcast(bounds))
        .filter(col("day") > col("d0") && col("day") <= col("d1"))
        .withColumn("status",
          when(col("present_today").isNotNull && col("present_yday").isNotNull,
            "retained")
            .when(col("present_today").isNotNull, "new").otherwise("churned"))
        .groupBy(col("day"))
        .agg(sum(when(col("status") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "churned", 1L).otherwise(0L))
            .as("n_churned"))
        .orderBy(col("day"))
    }),

    // MERGE INTO-style upsert, end to end THROUGH a file sink — the one
    // lakehouse op the CDC (q53) and SCD2 (q58) shapes circle but never
    // land. Target = latest state per (user_id, event_type) as of a
    // cutoff; source = the post-cutoff CDC batch compacted to one row per
    // key; tombstones (event_id % 19 == 0) delete. The physical shape is
    // the canonical MERGE plan every lakehouse engine lowers to: both
    // sides compact with ONE window keyed on the merge key, then a single
    // FULL OUTER join on that key resolves WHEN MATCHED (update/delete) /
    // NOT MATCHED (insert/skip) — no broadcast of the big side, no second
    // pass over history, scales as one shuffle per side at 100 TB. The
    // merge log (snapshot rows + applied action, deletes included — the
    // shape of a commit's change stream) is WRITTEN to a real parquet
    // sink and re-read before summarizing, so the gate covers the
    // write-path too.
    // NOTE: constructing this query EAGERLY writes the merge log to a
    // temp parquet dir (that is the point of the gate — the sink is part
    // of the op); the dir is removed on JVM exit via deleteRecursivelyOnExit.
    "q70_merge_upsert" -> ((s, d) => {
      val outPath = java.nio.file.Files.createTempDirectory("graft_merge_log")
      graft.queries.QueryTmp.deleteRecursivelyOnExit(outPath)
      val out = outPath.toString
      mergeUpsertLog(s, d).write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("action") =!= "delete", 1L).otherwise(0L)).as("n_keys"),
          sum(when(col("action") === "keep", 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("action") === "update", 1L).otherwise(0L))
            .as("n_updated"),
          sum(when(col("action") === "insert", 1L).otherwise(0L))
            .as("n_inserted"),
          sum(when(col("action") === "delete", 1L).otherwise(0L))
            .as("n_deleted"),
          sum(when(col("action") =!= "delete", col("event_id"))
            .otherwise(0L)).as("sum_ids"),
          round(sum(when(col("action") =!= "delete", col("value"))
            .otherwise(lit(0.0)).cast("decimal(18,6)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // MERGE upsert INTO AN INDEXED GENOMIC TABLE — composes the lakehouse
    // MERGE surface (q70) with the indexed VCF sink surface (f35): the
    // merged table (see indexedMergeRows) is WRITTEN through the bgzf+.tbi
    // VCF sink (range-partitioned + sorted as the index requires), then
    // re-read BOTH fully and REGION-PRUNED — `region=chr2:100001-200001`
    // descends the .tbi and reads only matching byte ranges, proving
    // upsert-into-an-indexed-genomic-table end to end. Deterministic
    // synthetic rows so the DuckDB oracle is closed-form. Fixed gate dir
    // with mode=overwrite (no temp accumulation); the write happens
    // EAGERLY at construction — the sink is the point of the gate.
    "q71_indexed_merge" -> ((s, _) => {
      val gate = new java.io.File(
        sys.props.get("java.io.tmpdir").getOrElse("/tmp"), "graft_gate_q71")
      gate.mkdirs()
      val out = new java.io.File(gate, "t").getAbsolutePath
      // NOTE (measured negative, r17 opt round): a localCheckpoint here —
      // repartitionByRange's sampling does re-run the merge subtree — lost
      // or tied 5/6 interleaved QTime windows: the range-derived merge is
      // cheaper to recompute than to materialize (the f36 gz-input cut is
      // the shape where the same idea wins). Don't retry without new data.
      indexedMergeRows(s)
        .repartitionByRange(4, col("chrom"), col("pos"))
        .sortWithinPartitions("chrom", "pos")
        .write.format("vcf").mode("overwrite")
        .option("compression", "bgzf").save(out)
      val full = s.read.format("vcf").load(out).agg(
        count(lit(1)).as("n_full"),
        sum(col("pos")).as("sum_pos"),
        sum(col("qual")).cast("long").as("sum_qual"))
      val reg = s.read.format("vcf").option("region", "chr2:100001-200001")
        .load(out).agg(
          count(lit(1)).as("n_region"),
          sum(col("qual")).cast("long").as("sum_qual_region"))
      full.crossJoin(reg)
    }),

    // BUCKETED co-located join through the driver gate (previously
    // BucketedJoinSpec only): lineitem and orders saved bucketBy(8) on the
    // join key, then joined + same-key aggregated. The gate REFUSES to
    // grade (f37 discipline) unless the physical plan is a SortMergeJoin
    // with ZERO hashpartitioning exchanges — the layout that turns a
    // repeated petabyte join into zero shuffles. Auto-broadcast is
    // disabled during the run (at gate SF the small side would broadcast
    // and hide the bucketed path); EAGER like q70 so the conf restore
    // cannot re-plan the asserted query.
    "q72_bucketed_join" -> ((s, d) => {
      def dropHard(name: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        if (loc.exists()) rm(loc)
      }
      // Rebuild only when the source parquet changed (mtime+size
      // fingerprint in a marker): repeated bench reps then time the
      // shuffle-free join itself, not the one-time layout write.
      val fp = {
        val f = new java.io.File(s"$d/lineitem.parquet")
        s"${f.lastModified}_${f.length}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      }
      val marker = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "_graft_q72_done")
      val cached = marker.exists() &&
        java.nio.file.Files.readString(marker.toPath) == fp &&
        s.catalog.tableExists("graft_q72_li") &&
        s.catalog.tableExists("graft_q72_o")
      if (!cached) {
        dropHard("graft_q72_li")
        dropHard("graft_q72_o")
        lineitem(s, d).select("l_orderkey", "l_quantity")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable("graft_q72_li")
        orders(s, d).select("o_orderkey", "o_totalprice")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable("graft_q72_o")
        marker.getParentFile.mkdirs()
        java.nio.file.Files.writeString(marker.toPath, fp)
      }
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val perKey = s.table("graft_q72_li")
          .join(s.table("graft_q72_o"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
        val plan = perKey.queryExecution.executedPlan.toString
        require(plan.contains("SortMergeJoin"),
          s"q72: bucketed join did not plan SortMergeJoin:\n$plan")
        require(!plan.contains("Exchange hashpartitioning"),
          s"q72: bucketed join still shuffles:\n$plan")
        val row = perKey.agg(
          count(lit(1)).as("n_keys"),
          round(sum(col("q")), 2).as("sum_q"),
          round(sum(col("p")), 2).as("sum_p")).collect().head
        import s.implicits._
        Seq((row.getLong(0), row.getDouble(1), row.getDouble(2)))
          .toDF("n_keys", "sum_q", "sum_p")
      } finally {
        // tables stay cached under the fingerprint marker for the next rep
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }),

    // AQE SKEW-JOIN through the driver gate: a fact with one hot key (a
    // third of all rows) sort-merge-joins a dim with auto-broadcast off;
    // the gate REFUSES to grade unless the FINAL adaptive plan shows
    // `SortMergeJoin(skew=true)` — Spark split the hot partition at
    // runtime, the complement to q50's manual salting and the mitigation
    // a 100 TB skewed join leans on when the skew is discovered, not
    // predicted. Skew thresholds are scaled to the gate corpus (the knob
    // a real deployment sizes to its partition stats); confs saved and
    // restored; EAGER so the assertion reads the executed plan.
    "q73_aqe_skew_join" -> ((s, _) => {
      val keys = Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set(keys(0), "64k")
        s.conf.set(keys(1), "2")
        s.conf.set(keys(2), "16k")
        s.conf.set(keys(3), "-1")
        val fact = s.range(0, 300000).select(
          when(col("id") % 3 === 0, 0L).otherwise(col("id")).as("k"),
          (col("id") % 97).as("v"))
        val dim = s.range(0, 50000).select(
          col("id").as("k"), (col("id") % 7).as("w"))
        val j = fact.join(dim, "k").agg(count(lit(1)).as("n"),
          sum(col("v") * col("w")).as("sv"))
        val row = j.collect().head
        val plan = j.queryExecution.executedPlan.toString
        require(plan.contains("skew=true"),
          s"q73: AQE did not split the skewed partition:\n$plan")
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1))).toDF("n", "sv")
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // MERGEABLE sketch states — the incremental-dashboard pattern: one
    // Datasketches HLL sketch per day (a storable binary state), then
    // hll_union_agg over the states instead of reprocessing raw events.
    // At 100 TB this is the difference between scanning all history per
    // dashboard refresh and merging kilobyte sketches; the estimate is
    // deterministic (hash-based, union is order-insensitive) and checked
    // against the exact distinct inline, q49-style.
    "q68_sketch_merge" -> ((s, d) => {
      val ev = events(s, d).select(to_date(col("ts")).as("day"), col("user_id"))
      val merged = ev.groupBy(col("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      ev.agg(countDistinct(col("user_id")).as("n_exact"))
        .crossJoin(broadcast(merged))
        .select(col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("within_5pct"))
    }),

    // Pivot → UNPIVOT round trip: the wide daily matrix (q43's pivot
    // shape) melts back to long form with `stack` (codegen'd generator,
    // the relational melt), and the re-aggregated totals must equal the
    // direct long-form aggregate — proving the melt loses nothing.
    // Counts, not sums, so every value is integer-exact.
    "q67_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types).agg(count(lit(1)))
      wide.select(col("day"), expr(
          s"stack(${types.length}, " +
            types.map(t => s"'$t', `$t`").mkString(", ") +
            ") as (event_type, n)"))
        .filter(col("n").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total"))
        .orderBy(col("event_type"))
    }),

    // Time-series gap fill: the hourly per-type series is sparse (not
    // every (type, hour) has events); materialize the dense grid with a
    // generator (sequence + explode — never a driver loop), left-join the
    // sparse counts, and forward-fill with last(ignoreNulls) over a
    // per-type ordered window. The grid is |types| × |hours| — the window
    // partitions by type, so at scale each series fills independently.
    "q66_gapfill" -> ((s, d) => {
      val hours = events(s, d).select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      val counts = hours.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"))
      val bounds = hours.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val grid = counts.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(counts, Seq("event_type", "h"), "left")
        .withColumn("filled", last(col("n"), ignoreNulls = true).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_gaps"),
          sum(coalesce(col("filled"), lit(0L))).as("sum_filled"))
        .orderBy(col("event_type"))
    }),

    // Semi-structured props: the events table's JSON column parsed with a
    // DECLARED schema (`from_json(props, 'k INT')` — codegen'd, no
    // driver-side schema inference pass, the only way JSON parse scales
    // to a 100 TB fact table), then a decile rollup of the extracted
    // field. get_json_object-per-field would re-parse the document per
    // path; one schema'd from_json parses once however many fields are
    // pulled.
    "q65_json_props" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"),
          expr("from_json(props, 'k INT').k").cast("long").as("k"))
        .withColumn("decile", expr("k div 10"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"), col("decile"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q05_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q14_promo_effect" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(tot_qty, 2) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS tot_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 150) big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q20_window_topk_per_supplier" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) x
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,

    "q21_rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q22_customers_no_orders" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q36_rich_inactive_customers" ->
      """WITH oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
        |  GROUP BY o_custkey)
        |SELECT n_name, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |LEFT JOIN oc ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND coalesce(n_orders, 0) < 5
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q34_disjunctive_bands" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND (
        |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 20) OR
        |  (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 30) OR
        |  (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 40))""".stripMargin,

    "q35_suppliers_kept_waiting" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) x
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(18,6))), 2) * 100 AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH stats AS (
        |  SELECT l_partkey AS sp_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
        |    count(*) AS n_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_lines,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) * 100
        |       AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN stats ON l_partkey = sp_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND CAST(l_quantity AS DECIMAL(18,6)) * 5 * n_qty < sum_qty""".stripMargin,

    "q33_event_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged),
        |per AS (SELECT user_id, session_seq, count(*) AS n_events
        |  FROM sess GROUP BY user_id, session_seq)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events
        |FROM per GROUP BY user_id
        |HAVING count(*) >= 2
        |ORDER BY user_id""".stripMargin,

    "q30_events_hourly" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS h,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY event_type, CAST(ts AS DATE), hour(ts)
        |HAVING count(*) >= 2
        |ORDER BY event_type, day, h""".stripMargin,

    "q31_events_user_rank" ->
      """SELECT rnk, user_id, total, n_purchases
        |FROM (SELECT user_id, round(sum(value), 2) AS total, count(*) AS n_purchases,
        |        rank() OVER (ORDER BY round(sum(value), 2) DESC, user_id) AS rnk
        |      FROM events
        |      WHERE event_type = 'purchase'
        |      GROUP BY user_id) x
        |WHERE rnk <= 25
        |ORDER BY rnk""".stripMargin,

    "q07_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) * 100 AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |GROUP BY 1, 2, 3
        |HAVING CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) * 100 AS BIGINT) > 5000000
        |ORDER BY 1, 2, 3""".stripMargin,

    "q08_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_product_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount) - l_quantity * 10.0), 2) AS profit
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,

    "q32_setops_nations" ->
      """(SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        | UNION
        | SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |EXCEPT
        |SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |ORDER BY n_name""".stripMargin,

    "q37_min_cost_supplier" ->
      """SELECT DISTINCT p_partkey, p_name, s_name,
        |  round(l_extendedprice, 2) AS min_price
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size < 10
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_extendedprice = (
        |  SELECT min(l2.l_extendedprice) FROM lineitem l2
        |  WHERE l2.l_partkey = lineitem.l_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,

    "q38_important_suppliers" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS value
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, round(value, 2) AS value
        |FROM rev
        |WHERE value > (SELECT avg(value) * 1.1 FROM rev)
        |ORDER BY value DESC, l_suppkey""".stripMargin,

    "q39_priority_shipping" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q40_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size IN (1, 5, 10, 15, 20)
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q41_range_join_banded" ->
      """SELECT p.event_id, count(*) AS n_clicks,
        |  round(sum(c.value), 2) AS click_value
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        | AND epoch_us(c.ts) < epoch_us(p.ts)
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q42_asof_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT p.event_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q43_pivot_events" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q44_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))), 2) * 100 AS BIGINT) AS revenue_cents,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,

    // plain join: bloom false positives are removed by the exact join, so
    // the pruned plan must produce byte-identical results to this
    "q45_bloom_semijoin_prune" ->
      """SELECT o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))), 2) * 100 AS BIGINT) AS revenue_cents,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // straight monthly from raw events — the incremental daily->monthly
    // path must reproduce this exactly
    "q46_incremental_rollup" ->
      """SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(CAST(value AS DECIMAL(18,6)), 2) * 100
        |    AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2 ORDER BY month, event_type""".stripMargin,

    // straight overlap join with range predicates — the banded plan must
    // produce exactly this pair set
    "q47_interval_overlap_join" ->
      """WITH iv AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS s0,
        |    epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000 AS e0
        |  FROM events),
        |p AS (SELECT * FROM iv WHERE event_type = 'purchase'),
        |v AS (SELECT * FROM iv WHERE event_type = 'view')
        |SELECT p.event_id, count(*) AS n_overlaps,
        |  CAST(sum(least(p.e0, v.e0) - greatest(p.s0, v.s0)) AS BIGINT)
        |    AS overlap_us
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND p.s0 < v.e0 AND v.s0 < p.e0
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q48_coverage_sweep" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s0,
        |    epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000 AS e0
        |  FROM events WHERE event_type = 'view'),
        |b AS (
        |  SELECT user_id, s0 AS pos, 1 AS d FROM iv
        |  UNION ALL
        |  SELECT user_id, e0 AS pos, -1 AS d FROM iv),
        |c AS (
        |  SELECT user_id, d,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY pos, d) AS depth
        |  FROM b)
        |SELECT user_id, CAST(max(depth) AS BIGINT) AS max_concurrent,
        |  CAST(count(*) FILTER (d = 1) AS BIGINT) AS n_intervals
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q49_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders_exact,
        |  count(DISTINCT l_partkey) AS n_parts_exact,
        |  true AS orders_within_5pct, true AS parts_within_5pct
        |FROM lineitem""".stripMargin,

    "q50_salted_skew_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "q51_trailing_range_window" ->
      """WITH w AS (
        |  SELECT user_id,
        |    count(*) OVER win AS c1h,
        |    sum(CAST(value AS DECIMAL(18,6))) OVER win AS s1h
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
        |SELECT user_id, max(c1h) AS peak_1h_events,
        |  CAST(round(max(s1h), 2) AS DOUBLE) AS peak_1h_value
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q52_funnel_conversion" ->
      """WITH firsts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
        |  CAST(sum(CASE WHEN t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM firsts""".stripMargin,

    "q53_cdc_compaction" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS n_live_keys,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |    AS sum_live_value,
        |  CAST(sum(event_id) AS BIGINT) AS sum_live_ids
        |FROM ranked WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q54_sliding_wau" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |wins AS (SELECT DISTINCT user_id, win_end FROM (
        |  SELECT user_id, CAST(unnest(generate_series(day,
        |    day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS win_end
        |  FROM active))
        |SELECT win_end, count(*) AS wau FROM wins
        |GROUP BY win_end ORDER BY win_end""".stripMargin,

    "q55_approx_quantile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_exact,
        |  true AS p50_within_1pct, true AS p99_within_1pct
        |FROM lineitem""".stripMargin,

    "q56_user_growth" ->
      """WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |npd AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM npd ORDER BY day""".stripMargin,

    "q57_retention_cohorts" ->
      """WITH activity AS (SELECT DISTINCT user_id,
        |    CAST(floor(datediff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) / 7) AS BIGINT) AS week
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week
        |  FROM activity GROUP BY user_id)
        |SELECT c.cohort_week, a.week - c.cohort_week AS "offset",
        |  count(*) AS n_users
        |FROM activity a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, "offset"""".stripMargin,

    "q58_scd2_intervals" ->
      """WITH v AS (
        |  SELECT event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS valid_to
        |  FROM events)
        |SELECT event_type, count(*) AS n_versions,
        |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL
        |      THEN epoch_us(valid_to) - epoch_us(ts) ELSE 0 END)
        |    AS BIGINT) AS sum_validity_us
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q59_fk_orphan_audit" ->
      """SELECT
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS orphan_lineitems,
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |    AS orphan_orders,
        |  (SELECT count(*) FROM events e WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        |    AS orphan_events""".stripMargin,

    "q60_zorder_extents" ->
      """WITH base AS (SELECT user_id,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS dayi
        |  FROM events),
        |sp AS (SELECT user_id, dayi,
        |    ((((((user_id & 255) | ((user_id & 255) << 4)) & 3855)
        |      | ((((user_id & 255) | ((user_id & 255) << 4)) & 3855) << 2)) & 13107)
        |      | (((((((user_id & 255) | ((user_id & 255) << 4)) & 3855)
        |      | ((((user_id & 255) | ((user_id & 255) << 4)) & 3855) << 2)) & 13107)) << 1)) & 21845
        |      AS su,
        |    ((((((dayi & 255) | ((dayi & 255) << 4)) & 3855)
        |      | ((((dayi & 255) | ((dayi & 255) << 4)) & 3855) << 2)) & 13107)
        |      | (((((((dayi & 255) | ((dayi & 255) << 4)) & 3855)
        |      | ((((dayi & 255) | ((dayi & 255) << 4)) & 3855) << 2)) & 13107)) << 1)) & 21845
        |      AS sd
        |  FROM base)
        |SELECT (su + 2 * sd) // 64 AS zbucket, count(*) AS n,
        |  max(user_id) - min(user_id) AS user_span,
        |  max(dayi) - min(dayi) AS day_span
        |FROM sp GROUP BY 1 ORDER BY zbucket""".stripMargin,

    "q61_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS n FROM events),
        |c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT user_id, cnt FROM c, t WHERE cnt * 128 > n
        |ORDER BY user_id""".stripMargin,

    "q62_range_bounds" ->
      """WITH t AS (SELECT count(*) AS n FROM events),
        |h AS (SELECT value, count(*) AS c FROM events GROUP BY 1),
        |cum AS (SELECT value, sum(c) OVER (ORDER BY value) AS cum FROM h),
        |tg AS (SELECT i, n FROM t, generate_series(1, 7) g(i))
        |SELECT i, min(value) AS bound FROM cum JOIN tg
        |  ON cum.cum * 8 >= tg.i * tg.n
        |GROUP BY i ORDER BY i""".stripMargin,

    "q63_dpp_prune" ->
      """WITH dim(event_type, weight) AS (VALUES
        |  ('click', 10), ('purchase', 500), ('view', 1),
        |  ('signup', 50), ('error', 0))
        |SELECT event_type, count(*) AS n,
        |  round(sum(value * weight), 2) AS weighted
        |FROM events JOIN dim USING (event_type)
        |WHERE weight >= 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q64_part_cooccurrence" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |w AS (SELECT l_orderkey, count(*) AS w FROM li0 GROUP BY 1),
        |ovf AS (SELECT CAST(sum(CASE WHEN w > 32 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overflow_orders FROM w),
        |li AS (SELECT li0.l_orderkey, li0.l_partkey FROM li0
        |  JOIN w USING (l_orderkey) WHERE w.w <= 32),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS t FROM li),
        |pcnt AS (SELECT l_partkey, count(*) AS pc FROM li GROUP BY 1),
        |pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    count(*) AS n_orders
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pa, pb, n_orders, ca.pc AS ca, cb.pc AS cb,
        |  (1000 * n_orders * tot.t) // (ca.pc * cb.pc) AS lift_permille,
        |  ovf.n_overflow_orders
        |FROM pairs JOIN pcnt ca ON pairs.pa = ca.l_partkey
        |  JOIN pcnt cb ON pairs.pb = cb.l_partkey, tot, ovf
        |ORDER BY n_orders DESC, pa, pb""".stripMargin,

    "q68_sketch_merge" ->
      """SELECT count(DISTINCT user_id) AS n_exact, true AS within_5pct
        |FROM events""".stripMargin,

    "q73_aqe_skew_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN i % 3 = 0 THEN 0 ELSE i END AS k, i % 97 AS v
        |  FROM generate_series(0, 299999) t(i)),
        |dim AS (SELECT i AS k, i % 7 AS w FROM generate_series(0, 49999) t(i))
        |SELECT count(*) AS n, CAST(sum(v * w) AS BIGINT) AS sv
        |FROM fact JOIN dim USING (k)""".stripMargin,

    "q72_bucketed_join" ->
      """WITH g AS (
        |  SELECT l_orderkey, sum(l_quantity) AS q, max(o_totalprice) AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1)
        |SELECT count(*) AS n_keys, round(CAST(sum(q) AS DOUBLE), 2) AS sum_q,
        |  round(CAST(sum(p) AS DOUBLE), 2) AS sum_p FROM g""".stripMargin,

    "q71_indexed_merge" ->
      """WITH tgt AS (
        |  SELECT 'chr' || CAST(i // 5000 AS VARCHAR) AS chrom,
        |         (i % 5000) * 100 + 1 AS pos,
        |         CAST(i % 50 AS DOUBLE) AS qual
        |  FROM generate_series(0, 19999) t(i)),
        |upd AS (
        |  SELECT 'chr' || CAST((j*5) // 5000 AS VARCHAR) AS chrom,
        |         ((j*5) % 5000) * 100 + 1 AS pos,
        |         CAST(50 + j % 25 AS DOUBLE) AS qual,
        |         CASE WHEN j % 10 = 0 THEN 'delete' ELSE 'update' END AS op
        |  FROM generate_series(0, 2999) t(j)),
        |ins AS (
        |  SELECT 'chr' || CAST(j % 4 AS VARCHAR) AS chrom,
        |         500001 + (j // 4) * 100 AS pos,
        |         CAST(10 + j % 40 AS DOUBLE) AS qual,
        |         'insert' AS op
        |  FROM generate_series(0, 2999) t(j)),
        |delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT coalesce(d.chrom, t.chrom) AS chrom,
        |         coalesce(d.pos, t.pos) AS pos,
        |         coalesce(d.qual, t.qual) AS qual,
        |         coalesce(d.op, 'keep') AS op
        |  FROM tgt t FULL OUTER JOIN delta d
        |    ON t.chrom = d.chrom AND t.pos = d.pos),
        |live AS (SELECT * FROM merged WHERE op <> 'delete')
        |SELECT (SELECT count(*) FROM live) AS n_full,
        |  (SELECT CAST(sum(pos) AS BIGINT) FROM live) AS sum_pos,
        |  (SELECT CAST(sum(qual) AS BIGINT) FROM live) AS sum_qual,
        |  (SELECT count(*) FROM live
        |     WHERE chrom = 'chr2' AND pos BETWEEN 100001 AND 200001) AS n_region,
        |  (SELECT CAST(sum(qual) AS BIGINT) FROM live
        |     WHERE chrom = 'chr2' AND pos BETWEEN 100001 AND 200001)
        |    AS sum_qual_region""".stripMargin,

    "q69_reconciliation" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
        |t AS (SELECT user_id, day, 1 AS pt FROM du),
        |y AS (SELECT user_id, day + CAST(1 AS INT) AS day, 1 AS py FROM du),
        |j AS (SELECT user_id, day, pt, py
        |  FROM t FULL OUTER JOIN y USING (user_id, day))
        |SELECT day,
        |  CAST(sum(CASE WHEN pt IS NOT NULL AND py IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN pt IS NOT NULL AND py IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN pt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_churned
        |FROM j, b WHERE day > d0 AND day <= d1
        |GROUP BY day ORDER BY day""".stripMargin,

    "q70_merge_upsert" ->
      """WITH tgt AS (SELECT user_id, event_type, t_id, t_value FROM (
        |    SELECT user_id, event_type, event_id AS t_id, value AS t_value,
        |      row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rn = 1),
        |src AS (SELECT user_id, event_type, s_id, s_value, tomb FROM (
        |    SELECT user_id, event_type, event_id AS s_id, value AS s_value,
        |      event_id % 19 = 0 AS tomb,
        |      row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rn = 1),
        |m AS (SELECT user_id, event_type,
        |    CASE WHEN s_id IS NULL THEN 'keep'
        |      WHEN tomb AND t_id IS NOT NULL THEN 'delete'
        |      WHEN tomb THEN 'skip'
        |      WHEN t_id IS NOT NULL THEN 'update'
        |      ELSE 'insert' END AS action,
        |    CASE WHEN s_id IS NULL THEN t_id ELSE s_id END AS event_id,
        |    CASE WHEN s_id IS NULL THEN t_value ELSE s_value END AS value
        |  FROM tgt FULL OUTER JOIN src USING (user_id, event_type)),
        |log AS (SELECT * FROM m WHERE action <> 'skip')
        |SELECT event_type,
        |  CAST(sum(CASE WHEN action <> 'delete' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_keys,
        |  CAST(sum(CASE WHEN action = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN action = 'update' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated,
        |  CAST(sum(CASE WHEN action = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inserted,
        |  CAST(sum(CASE WHEN action = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted,
        |  CAST(sum(CASE WHEN action <> 'delete' THEN event_id ELSE 0 END)
        |    AS BIGINT) AS sum_ids,
        |  CAST(round(sum(CASE WHEN action <> 'delete'
        |      THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END), 2) AS DOUBLE)
        |    AS sum_value
        |FROM log GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q67_unpivot" ->
      """SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(*) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q66_gapfill" ->
      """WITH hrs AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h
        |  FROM events),
        |counts AS (SELECT event_type, h, count(*) AS n FROM hrs
        |  GROUP BY 1, 2),
        |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
        |grid AS (SELECT t.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM counts) t,
        |    bounds b, unnest(generate_series(b.h0, b.h1)) AS g(h)),
        |joined AS (SELECT g.event_type, g.h, c.n,
        |    last_value(c.n IGNORE NULLS) OVER (PARTITION BY g.event_type
        |      ORDER BY g.h ROWS UNBOUNDED PRECEDING) AS filled
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.h = c.h)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gaps,
        |  CAST(sum(coalesce(filled, 0)) AS BIGINT) AS sum_filled
        |FROM joined GROUP BY 1 ORDER BY 1""".stripMargin,

    "q65_json_props" ->
      """SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS decile,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
