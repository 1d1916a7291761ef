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

    // F13: Z-order layout key — interleave the low 16 bits of two join/filter
    // columns into one clustering value. Range-partitioning + sorting on zval
    // is how a writer co-locates rows that are close in BOTH dimensions, so
    // min/max file stats prune scans filtered on either column (the layout
    // trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed with plain
    // codegen'd bit arithmetic — no UDF). The repartitionByRange models the
    // production write layout; the final orderBy/limit makes output stable.
    "f13_zorder_layout" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .withColumn("zval", expr(SortSetQueries.zvalSpark("l_partkey", "l_suppkey")))
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions("zval")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("zval"))
        .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
        .limit(2000)
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
        "ORDER BY l_returnflag, measure"),

    "f13_zorder_layout" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        s"${SortSetQueries.zvalDuck("l_partkey", "l_suppkey")} AS zval FROM lineitem " +
        "ORDER BY zval, l_orderkey, l_linenumber LIMIT 2000")
  )

  /** Bit-interleave expressions for the Z-order key, one per dialect (the
    * arithmetic is identical; Spark spells shifts as functions, DuckDB as
    * operators). x contributes odd bit positions, y even — 16 bits each. */
  private[operators] def zvalSpark(x: String, y: String): String =
    (0 until 16).map { i =>
      s"shiftleft(shiftrightunsigned(CAST($x AS BIGINT), $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftrightunsigned(CAST($y AS BIGINT), $i) & 1, ${2 * i})"
    }.mkString("(", " + ", ")")

  private[operators] def zvalDuck(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((CAST($x AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)} + " +
        s"((CAST($y AS BIGINT) >> $i) & 1) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")
}
