package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2 F1–F4 (global sort / top-k / set operations).
  *
  * Scale notes (100 TB): the global sort is a range-partitioned sort (sampled
  * bounds, no single-reducer funnel); ORDER BY + LIMIT compiles to
  * TakeOrderedAndProject (per-partition top-k, tiny driver merge — never a
  * full sort); set ops are shuffles on the full row like any distinct.
  */
object SortSetQueries extends QueryModule {

  val queries: Seq[(String, QFn)] = Seq(
    // F1: multi-key total sort with explicit null ordering (nulls injected
    // via nullif since the fixtures are null-free).
    "f1_sort_global" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
          col("c_acctbal"))
        .orderBy(asc_nulls_first("seg"), desc("c_acctbal"), asc("c_custkey"))
    }),

    // F2: ORDER BY … LIMIT k (TakeOrderedAndProject).
    "f2_topk_limit" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    }),

    // F3: UNION ALL of two overlapping event slices, then aggregate — the
    // duplicate-preserving semantics show up in the doubled counts.
    "f3_set_union_all" -> ((s, dir) => {
      val t = Tables(s, dir)
      val a = t.events.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type"))
      val b = t.events.filter(col("event_type").isin("view", "error"))
        .select(col("user_id"), col("event_type"))
      a.unionByName(b).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // F3b: UNION DISTINCT of the same slices.
    "f3b_set_union_distinct" -> ((s, dir) => {
      val t = Tables(s, dir)
      val a = t.events.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type"))
      val b = t.events.filter(col("event_type").isin("view", "error"))
        .select(col("user_id"), col("event_type"))
      a.unionByName(b).distinct().orderBy("user_id", "event_type")
    }),

    // F4: INTERSECT — customers that have orders AND a positive balance.
    "f4_set_intersect" -> ((s, dir) => {
      val t = Tables(s, dir)
      val withOrders = t.orders.select(col("o_custkey").as("k"))
      val positive = t.customer.filter(col("c_acctbal") > 0.0).select(col("c_custkey").as("k"))
      withOrders.intersect(positive).orderBy("k")
    }),

    // F4b: EXCEPT — positive-balance customers with no orders.
    "f4b_set_except" -> ((s, dir) => {
      val t = Tables(s, dir)
      val positive = t.customer.filter(col("c_acctbal") > 0.0).select(col("c_custkey").as("k"))
      val withOrders = t.orders.select(col("o_custkey").as("k"))
      positive.except(withOrders).orderBy("k")
    }),

    // F12: unpivot — wide per-flag aggregates back to (measure, value) long
    // form via the stack generator.
    "f12_unpivot" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.groupBy(col("l_returnflag"))
        .agg(Tables.dsum(col("l_quantity")).as("sum_qty"),
          Tables.dsum(col("l_extendedprice")).as("sum_price"))
        .selectExpr("l_returnflag",
          "stack(2, 'qty', sum_qty, 'price', sum_price) AS (measure, value)")
        .orderBy("l_returnflag", "measure")
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "f1_sort_global" ->
      ("SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal " +
        "FROM customer ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey"),

    "f2_topk_limit" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),

    "f3_set_union_all" ->
      ("SELECT event_type, count(*) AS n FROM (" +
        "SELECT user_id, event_type FROM events WHERE event_type IN ('click','view') " +
        "UNION ALL " +
        "SELECT user_id, event_type FROM events WHERE event_type IN ('view','error')) " +
        "GROUP BY event_type ORDER BY event_type"),

    "f3b_set_union_distinct" ->
      ("SELECT user_id, event_type FROM events WHERE event_type IN ('click','view') " +
        "UNION " +
        "SELECT user_id, event_type FROM events WHERE event_type IN ('view','error') " +
        "ORDER BY user_id, event_type"),

    "f4_set_intersect" ->
      ("SELECT o_custkey AS k FROM orders INTERSECT " +
        "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0.0 ORDER BY k"),

    "f4b_set_except" ->
      ("SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0.0 EXCEPT " +
        "SELECT o_custkey AS k FROM orders ORDER BY k"),

    "f12_unpivot" ->
      (s"WITH agg AS (SELECT l_returnflag, ${Tables.dsumSql("l_quantity")} AS sum_qty, " +
        s"${Tables.dsumSql("l_extendedprice")} AS sum_price FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, 'qty' AS measure, sum_qty AS value FROM agg " +
        "UNION ALL SELECT l_returnflag, 'price' AS measure, sum_price AS value FROM agg " +
        "ORDER BY l_returnflag, measure")
  )
}
