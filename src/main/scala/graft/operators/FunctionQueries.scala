package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2 F5–F11 (scalar function bands: string / datetime / json / math /
  * array / struct / conditional).
  *
  * All of these are codegen'd built-ins evaluated inside whole-stage codegen —
  * no UDFs in this band, so at 100 TB they run at scan speed. Integer sums are
  * cast to BIGINT on the oracle side (DuckDB widens sum(BIGINT) to HUGEINT).
  */
object FunctionQueries extends QueryModule {

  val queries: Seq[(String, QFn)] = Seq(
    // F5: string functions over part.
    "f5_fn_string" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.part.select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 10).as("prefix10"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        col("p_name").like("%al%").as("has_al"),
        size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")
    }),

    // F6: datetime functions over orders.
    "f6_fn_datetime" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("timestamp_ntz").as("plus90"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    }),

    // F7: JSON extraction from the props string column, then aggregate.
    "f7_fn_json" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
        .orderBy("event_type")
    }),

    // F8: math functions over part.
    "f8_fn_math" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.part.select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("price_r1"),
        abs(lit(10.0) - col("p_retailprice")).as("dist10"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_p"),
        round(log(col("p_retailprice")), 6).as("ln_p"),
        round(exp(col("p_retailprice") / 1000.0), 6).as("exp_p"),
        round(pow(col("p_size").cast("double"), 2.0), 6).as("size_sq"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        signum((col("p_size") - 25).cast("double")).cast("int").as("sgn"))
        .orderBy("p_partkey")
    }),

    // F9: array construction + higher-order functions over document tokens.
    "f9_fn_array" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          // The driver's comparator sorts/hashes scalar columns only, so
          // array results are serialized to strings on both engines.
          concat_ws(",", slice(col("toks"), 1, 5)).as("first5"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "data").as("has_data"),
          expr("CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS BIGINT)").as("total_len"),
          concat_ws(",", expr("transform(slice(toks, 1, 3), x -> upper(x))")).as("upper3"))
        .orderBy("doc_id")
    }),

    // F10: struct/map construction and field access (flattened projection —
    // the oracle compares the flat values).
    "f10_fn_map_struct" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation
        .withColumn("st", struct(col("n_name").as("name"), col("n_regionkey").as("region")))
        .withColumn("mp", map(lit("key"), col("n_nationkey")))
        .select(col("n_nationkey"),
          col("st").getField("name").as("sname"),
          col("st").getField("region").as("sregion"),
          element_at(col("mp"), "key").as("mval"))
        .orderBy("n_nationkey")
    }),

    // F11: conditional expressions.
    "f11_fn_conditional" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_x"),
        least(col("o_totalprice"), lit(200000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored"))
        .orderBy("o_orderkey")
    }),

    // F14: ordered string aggregation — Spark 4's ANSI listagg with
    // WITHIN GROUP, the report-building primitive (grouped concat is a
    // plain hash agg: one shuffle on the group key, no sort of the table).
    "f14_fn_listagg" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation.groupBy(col("n_regionkey"))
        .agg(
          expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }),

    // F15: the VARIANT type (Spark 4) — parse_json once into the binary
    // variant encoding, then typed variant_get extraction: the schema-on-read
    // path for semi-structured telemetry at 100 TB (parse once, extract many,
    // no per-field string re-parse). Oracle extracts the same field with
    // DuckDB's JSON reader.
    "f15_fn_variant" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          col("event_type"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("event_type")).as("n_types"))
        .orderBy("k")
    }),

    // F16: exact median / interpolated percentile — both engines interpolate
    // the midpoint of an even-sized group, so values are engine-comparable.
    "f16_fn_median" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"),
          median(col("l_extendedprice")).as("med_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // F17: bitwise function surface — and/or/xor/popcount/shifts, the ops
    // id-partitioners, bloom hashes, and bitmap codecs lean on. All exact
    // integer arithmetic, identical on any engine.
    "f17_fn_bitwise" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events.filter(col("event_id") < 200)
        .select(col("event_id"), col("user_id"),
          col("event_id").bitwiseAND(col("user_id")).as("band"),
          col("event_id").bitwiseOR(col("user_id")).as("bor"),
          col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
          bit_count(col("event_id")).as("bits"),
          shiftleft(col("event_id"), 3).as("shl"),
          shiftrightunsigned(col("event_id"), 2).as("shr"))
        .orderBy("event_id")
    }),

    // F18: COLLATION-aware semantics (Spark 4 collation engine) — grouping
    // and equality under UTF8_LCASE treat case variants as one key, inside
    // the hash aggregate itself (no lower() normalization column, so the
    // original spelling survives for display). The fixture langs are
    // lowercase, so a deterministic mixed-case perturbation (upper-case
    // every even doc's lang) makes the test real: grouped under the
    // collation, the perturbed column still yields one row per language.
    // The emitted key lower-cases the group representative — any
    // representative of a case-insensitive class lower-cases to the same
    // string, so the output is deterministic and the oracle is the plain
    // lowercase group-by.
    "f18_fn_collation" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(when(col("doc_id") % 2 === 0, upper(col("lang")))
          .otherwise(col("lang")).as("l"))
        .select(expr("collate(l, 'UTF8_LCASE')").as("lc"))
        .groupBy(col("lc"))
        .agg(count(lit(1)).as("n"))
        .select(lower(col("lc")).as("lang"), col("n"))
        .orderBy("lang")
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "f5_fn_string" ->
      ("SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand, " +
        "substring(p_name, 1, 10) AS prefix10, length(p_name) AS name_len, " +
        "replace(p_name, ' ', '_') AS snake, " +
        "regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
        "concat_ws('|', p_brand, p_type) AS brand_type, " +
        "lpad(p_brand, 12, '*') AS padded, " +
        "p_name LIKE '%al%' AS has_al, " +
        "len(str_split(p_name, ' ')) AS n_words " +
        "FROM part ORDER BY p_partkey"),

    "f6_fn_datetime" ->
      ("SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, " +
        "day(o_orderdate) AS d, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
        "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since, " +
        "CAST(o_orderdate AS DATE) + 30 AS due_date, " +
        "o_orderdate + INTERVAL 90 DAY AS plus90, " +
        "epoch_us(o_orderdate) // 1000000 AS epoch_s " +
        "FROM orders ORDER BY o_orderkey"),

    "f7_fn_json" ->
      ("SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k FROM (" +
        "SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) " +
        "GROUP BY event_type ORDER BY event_type"),

    "f8_fn_math" ->
      ("SELECT p_partkey, round(p_retailprice, 1) AS price_r1, " +
        "abs(10.0 - p_retailprice) AS dist10, " +
        "round(sqrt(p_retailprice), 6) AS sqrt_p, " +
        "round(ln(p_retailprice), 6) AS ln_p, " +
        "round(exp(p_retailprice / 1000.0), 6) AS exp_p, " +
        "round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq, " +
        "CAST(floor(p_retailprice) AS BIGINT) AS fl, CAST(ceil(p_retailprice) AS BIGINT) AS ce, " +
        "CAST(sign(CAST(p_size - 25 AS DOUBLE)) AS INT) AS sgn " +
        "FROM part ORDER BY p_partkey"),

    "f9_fn_array" ->
      ("SELECT doc_id, len(toks) AS n_toks, " +
        "array_to_string(list_slice(toks, 1, 5), ',') AS first5, " +
        "len(list_distinct(toks)) AS n_distinct, " +
        "list_contains(toks, 'data') AS has_data, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len, " +
        "array_to_string(list_transform(list_slice(toks, 1, 3), x -> upper(x)), ',') AS upper3 " +
        "FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents) " +
        "ORDER BY doc_id"),

    "f10_fn_map_struct" ->
      ("SELECT n_nationkey, n_name AS sname, n_regionkey AS sregion, " +
        "n_nationkey AS mval FROM nation ORDER BY n_nationkey"),

    "f11_fn_conditional" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice > 300000.0 THEN 'high' " +
        "WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS tier, " +
        "COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x, " +
        "least(o_totalprice, 200000.0) AS capped, " +
        "greatest(o_totalprice, 50000.0) AS floored " +
        "FROM orders ORDER BY o_orderkey"),

    "f14_fn_listagg" ->
      ("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
        "count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"),

    "f15_fn_variant" ->
      ("SELECT k, count(*) AS n, count(DISTINCT event_type) AS n_types FROM (" +
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type " +
        "FROM events) GROUP BY k ORDER BY k"),

    "f16_fn_median" ->
      ("SELECT l_returnflag, median(l_quantity) AS med_qty, " +
        "median(l_extendedprice) AS med_price, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "f17_fn_bitwise" ->
      ("SELECT event_id, user_id, event_id & user_id AS band, " +
        "event_id | user_id AS bor, xor(event_id, user_id) AS bxor, " +
        "CAST(bit_count(event_id) AS INT) AS bits, " +
        "event_id << 3 AS shl, event_id >> 2 AS shr " +
        "FROM events WHERE event_id < 200 ORDER BY event_id"),

    // case-insensitive grouping over the perturbed column == the plain
    // lowercase group-by
    "f18_fn_collation" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang"
  )
}
