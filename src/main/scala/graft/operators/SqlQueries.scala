package graft.operators

import graft.{QueryModule, Tables}

/** SQL interface — the engine's surface is not only the DataFrame API: every
  * fixture table registers as a temp view and ANSI SQL runs through the same
  * Catalyst pipeline. The declared SQL is dialect-shared with DuckDB, so the
  * oracle replays the IDENTICAL statement.
  */
object SqlQueries extends QueryModule {

  private val tpch3 =
    "SELECT o_orderkey, " +
      s"round(${Tables.dsumSql("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' " +
      "AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01' " +
      "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"

  private val sqlWindow =
    "SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (" +
      "SELECT c_nationkey, c_custkey, c_acctbal, " +
      "rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk " +
      "FROM customer) ranked WHERE rnk <= 3 ORDER BY c_nationkey, rnk"

  // Correlated scalar subquery (Catalyst decorrelates it into a join; SURVEY
  // §4). The per-customer average goes through decimal so the threshold
  // comparison is bit-identical across engines.
  private val sqlCorrelated =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
      "WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(27,6))) AS DOUBLE) / count(*) " +
      "FROM orders o2 WHERE o2.o_custkey = o.o_custkey) " +
      "ORDER BY o_orderkey"

  // TPC-H Q2 shape over this fixture's schema (lineitem stands in for
  // partsupp: l_partkey/l_suppkey carry the part-supplier relation). For
  // each PROMO small part, the suppliers in EUROPE offering it at the
  // region-wide minimum price — a correlated aggregate over a 4-way join
  // that Catalyst must decorrelate into a shared min-per-part subplan.
  // DISTINCT collapses repeat lineitems of the same (part, supplier) at the
  // minimum; ordering is total (s_name unique, p_partkey breaks the rest).
  private val sqlQ2 =
    "SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type, l_extendedprice AS min_price " +
      "FROM part JOIN lineitem ON l_partkey = p_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON n_nationkey = s_nationkey " +
      "JOIN region ON r_regionkey = n_regionkey " +
      "WHERE r_name = 'EUROPE' AND p_size <= 10 AND p_type = 'PROMO' " +
      "AND l_extendedprice = (" +
      "SELECT min(l2.l_extendedprice) FROM lineitem l2 " +
      "JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey " +
      "JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey " +
      "JOIN region r2 ON r2.r_regionkey = n2.n_regionkey " +
      "WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE') " +
      "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"

  // TPC-H Q1 pricing summary — the canonical wide scan-aggregate: one pass
  // over lineitem, 4 decimal sums + 3 averages + a count per (flag, status).
  // At 100 TB this is the map-side-combine showcase: partials collapse to
  // |groups| rows per task before the single tiny shuffle.
  // The four big sums stay exact decimals floored to BIGINT: at sf0.1 they
  // reach 4.4e9, where a double's ulp (~1e-6) equals the 6th decimal — the
  // engines' decimal→double casts then legitimately disagree by one ulp
  // (observed: 4354963544.0333 vs …033301). Integers < 2^53 are exact in
  // every representation on both engines. The averages (~5e4) are far from
  // that regime and keep the rounded-double shape.
  private def exactSum(x: String, alias: String): String =
    s"CAST(floor(sum(CAST(($x) AS DECIMAL(27,6)))) AS BIGINT) AS $alias"

  private val tpch1 =
    "SELECT l_returnflag, l_linestatus, " +
      s"${exactSum("l_quantity", "sum_qty")}, " +
      s"${exactSum("l_extendedprice", "sum_base_price")}, " +
      s"${exactSum("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")}, " +
      s"${exactSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", "sum_charge")}, " +
      s"round(${Tables.davgSql("l_quantity")}, 6) AS avg_qty, " +
      s"round(${Tables.davgSql("l_extendedprice")}, 6) AS avg_price, " +
      s"round(${Tables.davgSql("l_discount")}, 6) AS avg_disc, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  // TPC-H Q5 local-supplier volume — the 6-way join with a cycle (customer
  // and supplier must share a nation), which exercises join reorder over a
  // non-tree join graph; region/nation broadcast, the fact joins shuffle.
  private val tpch5 =
    "SELECT n_name, " +
      s"round(${Tables.dsumSql("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name"

  // Recursive CTE (Spark 4.x WITH RECURSIVE): a 12-row month spine generated
  // by the recursion itself, LEFT-joined to 1996 orders so empty months
  // survive with n_orders = 0 — the calendar-spine idiom without a calendar
  // table. Dialect-shared verbatim with DuckDB.
  private val sqlRecursive =
    "WITH RECURSIVE months(m) AS (SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12) " +
      "SELECT m, count(o_orderkey) AS n_orders, " +
      "CAST(floor(sum(CAST(o_totalprice AS DECIMAL(27,6)))) AS BIGINT) AS revenue " +
      "FROM months LEFT JOIN orders ON month(o_orderdate) = m AND year(o_orderdate) = 1996 " +
      "GROUP BY m ORDER BY m"

  // LATERAL correlated subquery with ORDER BY + LIMIT — top-2 customers by
  // balance per nation. Catalyst plans the lateral as a per-row correlated
  // join it can decorrelate; the deterministic tiebreak (c_custkey) makes
  // the LIMIT 2 row set engine-independent.
  private val sqlLateral =
    "SELECT n_name, c_custkey, c_acctbal FROM nation, " +
      "LATERAL (SELECT c_custkey, c_acctbal FROM customer WHERE c_nationkey = n_nationkey " +
      "ORDER BY c_acctbal DESC, c_custkey LIMIT 2) " +
      "ORDER BY n_name, c_acctbal DESC, c_custkey"

  // TPC-H Q18 large-volume customers — GROUP BY + HAVING inside an IN
  // subquery. Catalyst plans the IN as a left-semi join against the
  // re-aggregated lineitem; at scale both aggregations are map-side-combined
  // on the same key (l_orderkey/o_orderkey), so AQE can reuse the exchange.
  // sum_qty goes through exact decimal→BIGINT (magnitude rule, §7.4).
  private val tpch18 =
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, " +
      s"${exactSum("l_quantity", "sum_qty")} " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE o_orderkey IN (" +
      "SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) " +
      "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"

  // TPC-H Q9 product-type profit shape over this fixture's schema: profit
  // per (supplier nation, order year) for widget parts, with supply cost
  // standing in as 60% of p_retailprice (the fixture has no partsupp).
  // Exercises a 5-way join with a LIKE filter on the dimension, grouped on
  // expressions from two different tables — the join-reorder + partial-agg
  // shape of Q9 without its table.
  private val tpch9 =
    "SELECT n_name, year(o_orderdate) AS o_year, " +
      s"${exactSum("l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity", "profit")} " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN nation ON n_nationkey = s_nationkey " +
      "WHERE p_name LIKE '%widget%' " +
      "GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year DESC"

  // TPC-H Q22 shape (global-sales-opportunity) over this fixture's schema:
  // customers with above-average positive balance and NO order since 2000,
  // grouped by nation. The scalar average goes through exact decimal so the
  // threshold is bit-identical across engines; NOT EXISTS plans as an
  // anti join (broadcast or shuffled, AQE's choice at scale).
  private val tpch22 =
    "SELECT c_nationkey, count(*) AS numcust, " +
      s"round(${Tables.dsumSql("c_acctbal")}, 6) AS totacctbal " +
      "FROM customer WHERE c_acctbal > (" +
      s"SELECT ${Tables.davgSql("c_acctbal")} FROM customer WHERE c_acctbal > 0.0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders " +
      "WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  // TPC-H Q6 forecasting-revenue-change — the canonical pushdown scan: three
  // range predicates and a 2-column projection must reach the parquet reader
  // (PushedFilters + pruned ReadSchema); the aggregate is a single exact
  // decimal sum. At 100 TB this query IS the scan efficiency test: no join,
  // no shuffle beyond one partial-agg merge row per task.
  private val tpch6 =
    "SELECT " +
      s"round(${Tables.dsumSql("l_extendedprice * l_discount")}, 6) AS revenue " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0"

  // TPC-H Q7 volume-shipping — nation-pair trade flow with a symmetric
  // disjunctive join filter (France→Germany OR Germany→France in spec terms):
  // two aliases of the same dimension joined to opposite sides of the fact
  // chain. Catalyst broadcasts both nation aliases; the OR predicate cannot
  // be pushed into either join alone and lands as a post-join filter —
  // exactly the shape a join-reorder must not break. Revenue is decimal →
  // floored BIGINT (magnitude rule: sums cross 2^53/1e6 at big SFs).
  private val tpch7 =
    "SELECT supp_nation, cust_nation, l_year, " +
      s"${exactSum("volume", "revenue")} FROM (" +
      "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "year(l_shipdate) AS l_year, l_extendedprice * (1.0 - l_discount) AS volume " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
      "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
      "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1998-01-01') shipping " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"

  // TPC-H Q8 national-market-share — 7-way join where the share is a
  // conditional-over-total ratio per order year. Both the numerator and the
  // denominator are EXACT decimal sums cast to double only at the end, so
  // the single float division (and its round) is bit-identical across
  // engines — the only way a ratio of big sums survives an oracle hash
  // compare. Customer region filters through region; the share nation tags
  // the supplier side.
  private val tpch8 =
    "SELECT o_year, round(CAST(sum(CASE WHEN nation = 'NATION_3' " +
      "THEN CAST(volume AS DECIMAL(27,6)) ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE) " +
      "/ CAST(sum(CAST(volume AS DECIMAL(27,6))) AS DOUBLE), 6) AS mkt_share " +
      "FROM (SELECT year(o_orderdate) AS o_year, " +
      "l_extendedprice * (1.0 - l_discount) AS volume, n2.n_name AS nation " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY') all_nations " +
      "GROUP BY o_year ORDER BY o_year"

  // TPC-H Q10 returned-item reporting — one quarter of 'R' lineitems rolled
  // up per customer, top 20 by lost revenue. The group key spans customer +
  // nation attributes (post-join grouping on a wide key); the LIMIT gets a
  // deterministic tiebreak on c_custkey.
  private val tpch10 =
    "SELECT c_custkey, c_name, " +
      s"round(${Tables.dsumSql("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue, " +
      "c_acctbal, n_name " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1996-04-01' AND l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
      "ORDER BY revenue DESC, c_custkey LIMIT 20"

  // TPC-H Q14 promotion-effect — percent-of-total over one month: the same
  // exact-decimal numerator/denominator discipline as Q8, on a broadcast
  // part join. The month filter must reach the lineitem scan.
  private val tpch14 =
    "SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' " +
      "THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6)) " +
      "ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE) " +
      "/ CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 6) " +
      "AS promo_revenue " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"

  // TPC-H Q4 order-priority check — EXISTS semi-join against the fact table
  // with a correlated non-equi predicate (fixture adaptation: the spec's
  // commit<receipt "late" test becomes shipdate>orderdate; same plan shape —
  // a left-semi join Catalyst derives from EXISTS, count per priority).
  private val tpch4 =
    "SELECT o_orderpriority, count(*) AS order_count FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1996-07-01' " +
      "AND o_orderdate < TIMESTAMP '1996-10-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  // TPC-H Q11 important-stock — GROUP BY ... HAVING against a global scalar
  // subquery (fixture adaptation: lineitem value per part stands in for
  // partsupp cost×qty; one nation's suppliers). Both the per-part and the
  // global sums are exact decimals cast to double once, so the threshold
  // comparison is bit-identical across engines.
  private val tpch11 =
    s"SELECT l_partkey, ${exactSum("l_extendedprice", "value")} " +
      "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1' " +
      "GROUP BY l_partkey " +
      s"HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) > " +
      // scale-invariant threshold: 2x the average per-part share (the spec
      // scales Q11's fraction by 1/SF for the same reason — a fixed share
      // selects nothing once the part population grows)
      "(SELECT 2.0 * CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) " +
      "/ count(DISTINCT l_partkey) " +
      "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1') " +
      "ORDER BY value DESC, l_partkey"

  // TPC-H Q12 shipping-mode priority split — join + conditional counting
  // (fixture adaptation: returnflag stands in for shipmode, late = shipped
  // after the order date). count(CASE...) keeps both engines in BIGINT.
  private val tpch12 =
    "SELECT l_returnflag, " +
      "count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count, " +
      "count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE l_shipdate > o_orderdate " +
      "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY l_returnflag ORDER BY l_returnflag"

  // TPC-H Q13 customer order-count distribution — LEFT OUTER with an extra
  // join-side filter, then a second aggregation over the first's result
  // (the distribution-of-counts double group-by).
  private val tpch13 =
    "SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
      "LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
      "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) c_orders " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"

  // TPC-H Q15 top supplier — a CTE reused twice: once joined, once under
  // max(); the revenue ties back via an exact-decimal-derived double so the
  // equality against max is engine-stable.
  private val tpch15 =
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
      "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue " +
      "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
      "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue) " +
      "ORDER BY s_suppkey"

  // TPC-H Q16 supplier count by part attributes — NOT IN anti-subquery +
  // count(DISTINCT) over a multi-attribute group (fixture adaptation:
  // lineitem carries the part-supplier relation; the spec's complaint
  // filter becomes negative account balance).
  private val tpch16 =
    "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO' " +
      "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"

  // TPC-H Q17 small-quantity-order revenue — correlated scalar AVG subquery
  // per part (Catalyst decorrelates into a shared per-part aggregate); the
  // 0.2×avg threshold goes through exact decimal sum / count so the float
  // comparison is identical on both engines.
  private val tpch17 =
    "SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand = 'Brand#1' AND p_type = 'SMALL' " +
      "AND l_quantity < (SELECT 0.2 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(27,6))) AS DOUBLE) / count(*) " +
      "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"

  // TPC-H Q19 discounted-revenue — the OR-of-ANDs disjunctive predicate
  // spanning both join sides: the per-branch part filters can push to the
  // part scan, the quantity bands to lineitem, but the cross-table residual
  // must stay on the join — the classic pushdown-boundary test.
  private val tpch19 =
    s"SELECT round(${Tables.dsumSql("l_extendedprice * (1.0 - l_discount)")}, 6) AS revenue " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 " +
      "AND l_quantity >= 1 AND l_quantity <= 11) " +
      "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 " +
      "AND l_quantity >= 10 AND l_quantity <= 20) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity >= 20 AND l_quantity <= 30)"

  // TPC-H Q20 potential promotion suppliers — an IN-subquery whose inner
  // query compares a filtered aggregate to a share of an unfiltered one
  // (fixture adaptation: "1996 PROMO shipments exceed 12% of all-time PROMO shipments" stands in for
  // availqty > half of shipped). Two CTEs joined
  // on supplier keep the threshold exact-decimal-derived.
  private val tpch20 =
    "WITH promo96 AS (SELECT l_suppkey, " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS q96 " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_type = 'PROMO' AND l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01' GROUP BY l_suppkey), " +
      "promoall AS (SELECT l_suppkey AS sk, " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS qall " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_type = 'PROMO' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name FROM supplier " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_2' " +
      "AND s_suppkey IN (SELECT l_suppkey FROM promo96 " +
      "JOIN promoall ON sk = l_suppkey WHERE q96 > 0.12 * qall) " +
      "ORDER BY s_suppkey"

  // TPC-H Q21 waiting suppliers — the EXISTS + NOT EXISTS double
  // correlation on the same fact table (fixture adaptation: "late" =
  // shipped after the order date): the only supplier who shipped late on a
  // finished multi-supplier order. Catalyst turns the pair into a
  // left-semi + left-anti join stack over lineitem.
  private val tpch21 =
    "SELECT s_name, count(*) AS numwait FROM supplier " +
      "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE o_orderstatus = 'F' AND n_name = 'NATION_1' " +
      "AND l1.l_shipdate > o_orderdate " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
      "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
      "AND l3.l_shipdate > o_orderdate) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"

  private def registerAll(s: org.apache.spark.sql.SparkSession, dir: String): Tables = {
    val t = Tables(s, dir)
    t.region.createOrReplaceTempView("region")
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    t.supplier.createOrReplaceTempView("supplier")
    t.part.createOrReplaceTempView("part")
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    t.documents.createOrReplaceTempView("documents")
    t.embeddings.createOrReplaceTempView("embeddings")
    t
  }

  val queries: Seq[(String, QFn)] = Seq(
    // TPC-H Q3 shape, straight through spark.sql.
    "s1_sql_tpch3" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch3)
    }),

    // SQL window function through the shared dialect.
    "s2_sql_window_rank" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(sqlWindow)
    }),

    // Correlated scalar subquery through the shared dialect.
    "s3_sql_correlated" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(sqlCorrelated)
    }),

    // TPC-H Q2 shape: min-cost supplier per part via correlated aggregate.
    "s4_sql_tpch2" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(sqlQ2)
    }),

    // TPC-H Q1: the scan-aggregate workhorse.
    "s5_sql_tpch1" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch1)
    }),

    // TPC-H Q5: cyclic 6-way join + join-reorder stress.
    "s6_sql_tpch5" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch5)
    }),

    // Recursive CTE month spine (Spark 4.x WITH RECURSIVE).
    "s7_sql_recursive_cte" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(sqlRecursive)
    }),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT.
    "s8_sql_lateral" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(sqlLateral)
    }),

    // TPC-H Q18: HAVING-filtered IN subquery → left-semi join.
    "s9_sql_tpch18" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch18)
    }),

    // TPC-H Q9 shape: 5-way join, LIKE dim filter, two-table group key.
    "s10_sql_tpch9" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch9)
    }),

    // TPC-H Q22 shape: decimal-exact scalar threshold + NOT EXISTS anti join.
    "s11_sql_tpch22" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch22)
    }),

    // TPC-H Q6: the pure pushdown-scan aggregate.
    "s12_sql_tpch6" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch6)
    }),

    // TPC-H Q7: nation-pair flow, disjunctive cross-dimension filter.
    "s13_sql_tpch7" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch7)
    }),

    // TPC-H Q8: market share — exact-decimal ratio over a 7-way join.
    "s14_sql_tpch8" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch8)
    }),

    // TPC-H Q10: returned-item top-20 by lost revenue.
    "s15_sql_tpch10" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch10)
    }),

    // TPC-H Q14: promotion revenue share over one month.
    "s16_sql_tpch14" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch14)
    }),

    // TPC-H Q4: EXISTS semi-join with non-equi correlation.
    "s17_sql_tpch4" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch4)
    }),

    // TPC-H Q11: HAVING vs a global scalar subquery.
    "s18_sql_tpch11" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch11)
    }),

    // TPC-H Q12: conditional counting over a late-shipment join.
    "s19_sql_tpch12" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch12)
    }),

    // TPC-H Q13: order-count distribution (double group-by over outer join).
    "s20_sql_tpch13" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch13)
    }),

    // TPC-H Q15: CTE reused as join input and under max().
    "s21_sql_tpch15" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch15)
    }),

    // TPC-H Q16: NOT IN anti-subquery + count distinct.
    "s22_sql_tpch16" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch16)
    }),

    // TPC-H Q17: correlated scalar AVG threshold.
    "s23_sql_tpch17" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch17)
    }),

    // TPC-H Q19: disjunctive OR-of-ANDs join predicate.
    "s24_sql_tpch19" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch19)
    }),

    // TPC-H Q20: nested IN with a share-of-aggregate threshold.
    "s25_sql_tpch20" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch20)
    }),

    // TPC-H Q21: EXISTS + NOT EXISTS double correlation.
    "s26_sql_tpch21" -> ((s, dir) => {
      registerAll(s, dir)
      s.sql(tpch21)
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "s1_sql_tpch3" -> tpch3,
    "s2_sql_window_rank" -> sqlWindow,
    "s3_sql_correlated" -> sqlCorrelated,
    "s4_sql_tpch2" -> sqlQ2,
    "s5_sql_tpch1" -> tpch1,
    "s6_sql_tpch5" -> tpch5,
    "s7_sql_recursive_cte" -> sqlRecursive,
    "s8_sql_lateral" -> sqlLateral,
    "s9_sql_tpch18" -> tpch18,
    "s10_sql_tpch9" -> tpch9,
    "s11_sql_tpch22" -> tpch22,
    "s12_sql_tpch6" -> tpch6,
    "s13_sql_tpch7" -> tpch7,
    "s14_sql_tpch8" -> tpch8,
    "s15_sql_tpch10" -> tpch10,
    "s16_sql_tpch14" -> tpch14,
    "s17_sql_tpch4" -> tpch4,
    "s18_sql_tpch11" -> tpch11,
    "s19_sql_tpch12" -> tpch12,
    "s20_sql_tpch13" -> tpch13,
    "s21_sql_tpch15" -> tpch15,
    "s22_sql_tpch16" -> tpch16,
    "s23_sql_tpch17" -> tpch17,
    "s24_sql_tpch19" -> tpch19,
    "s25_sql_tpch20" -> tpch20,
    "s26_sql_tpch21" -> tpch21
  )
}
