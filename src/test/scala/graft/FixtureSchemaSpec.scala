package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** One-place guard against driver-side fixture regeneration drift.
  *
  * The fixtures under /root/testdata are owned by the harness and have been
  * regenerated mid-build before (events.ts switched from timestamp[ns] to
  * timestamp[us] between rounds 11 and 12, silently breaking every events
  * consumer). This spec pins, in ONE assertion per table, the column names
  * and the physical-type families the loader (Tables.scala) knows how to
  * read — so the next regeneration fails here with one actionable message
  * instead of as dozens of scattered query failures.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import TestSpark._

  /** Type families the repo's readers support for each column kind. */
  private def family(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType                        => "float"
    case StringType                                    => "string"
    // ns fixtures arrive as LongType under nanosAsLong; µs as (n)tz timestamp.
    case TimestampType | TimestampNTZType | DateType   => "time"
    case ArrayType(FloatType | DoubleType, _)          => "vec"
    case other                                         => s"UNSUPPORTED(${other.simpleString})"
  }

  /** table -> expected (colName -> family), in no particular order. */
  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "int", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "float", "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "int", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "float"),
    "part" -> Map("p_partkey" -> "int", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "float"),
    "orders" -> Map("o_orderkey" -> "int", "o_custkey" -> "int",
      "o_orderstatus" -> "string", "o_totalprice" -> "float",
      "o_orderdate" -> "time", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "int", "l_partkey" -> "int",
      "l_suppkey" -> "int", "l_linenumber" -> "int", "l_quantity" -> "float",
      "l_extendedprice" -> "float", "l_discount" -> "float", "l_tax" -> "float",
      "l_returnflag" -> "string", "l_linestatus" -> "string", "l_shipdate" -> "time"),
    "events" -> Map("event_id" -> "int", "ts" -> "time", "user_id" -> "int",
      "event_type" -> "string", "value" -> "float", "props" -> "string"),
    "documents" -> Map("doc_id" -> "int", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "int"),
    "embeddings" -> Map("vec_id" -> "int", "embedding" -> "vec", "label" -> "int")
  )

  test("all 10 fixture tables carry the column names and type families the loader supports") {
    val t = Tables(spark, sfDir)
    val drifts = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val actual = spark.read.parquet(s"$sfDir/$name.parquet").schema
      val actualMap = actual.fields.map(f => f.name -> family(f.dataType)).toMap
      val missing = cols.keySet -- actualMap.keySet
      val extra = actualMap.keySet -- cols.keySet
      val mismatched = cols.collect {
        case (c, fam) if actualMap.get(c).exists(_ != fam) =>
          s"$c expected family '$fam' got '${actualMap(c)}' (${actual(c).dataType.simpleString})"
      }
      val issues = missing.toSeq.sorted.map(c => s"missing column $c") ++
        extra.toSeq.sorted.map(c => s"unexpected column $c") ++ mismatched
      issues.map(i => s"$name: $i")
    }
    assert(drifts.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT — the driver regenerated /root/testdata with a " +
        s"layout this repo's loader (graft.Tables) does not expect.\n" +
        drifts.mkString("  ", "\n  ", "\n") +
        "Fix: update graft.Tables (and this spec) for the new layout; see the " +
        "dtype-adaptive events.ts handling in Tables.events for the pattern.")
  }

  test("events.ts physical type is one the dtype-adaptive loader handles, and the load parses") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(raw),
      s"events.ts reads as ${raw.simpleString}; Tables.events handles only " +
        "long (ns-as-long fixtures) or (n)tz timestamp (µs fixtures)")
    val ev = Tables(spark, sfDir).events
    assert(ev.schema("ts").dataType == TimestampNTZType)
    // analysis + one row: the conversion expression itself must be valid
    assert(ev.limit(1).count() == 1)
  }

  test("eventsRawSchema tracks the file footer (streaming readers depend on it)") {
    val t = Tables(spark, sfDir)
    val batch = spark.read.parquet(s"$sfDir/events.parquet").schema
    assert(t.eventsRawSchema == batch)
  }
}
