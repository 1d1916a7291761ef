package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.AsOfJoin — the full custom-operator chain (logical node →
  * strategy → sorted-merge physical join) behind c15_join_asof_native.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("c15 plans through GraftAsOfJoinExec") {
    val df = SparkEntry.queries("c15_join_asof_native")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("GraftAsOfJoin"))
  }

  test("c15 output is row-for-row identical to the window formulation (c10)") {
    val native = SparkEntry.queries("c15_join_asof_native")(spark, sfDir)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("c10_join_asof")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(native.length == window.length && native.length > 0)
    assert(native.toSeq == window.toSeq)
  }

  test("unmatched left rows null-extend; ties on ts break by the id column") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val left = Seq(
      (1000L, 10L, 100L), // user 1: click at t=5 precedes
      (2000L, 10L, 200L), // user 1: t=200 tie → click id 150 < 2000 precedes lexicographically
      (3000L, 20L, 100L), // user 2: no clicks at all → nulls
      (4000L, 30L, 100L)  // user 3: clicks only AFTER t=100 → nulls
    ).toDF("l_id", "l_user", "l_t")
    val right = Seq(
      (90L, 10L, 5L),    // user 1, t=5
      (150L, 10L, 200L), // user 1, t=200 == left l_id=2000's t
      (95L, 30L, 500L)   // user 3, t=500 — after every left row
    ).toDF("r_id", "r_user", "r_t")
    val out = graft.plans.GraftOps.asofJoin(left, right,
        Seq(left("l_user")), Seq(right("r_user")),
        Seq(left("l_t"), left("l_id")), Seq(right("r_t"), right("r_id")))
      .select(col("l_id"), col("r_id"), col("r_t"))
      .orderBy("l_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq(
      (1000L, 90L, 5L),    // latest click before t=100
      (2000L, 150L, 200L), // same t, smaller id → strictly precedes
      (3000L, -1L, -1L),   // user without right rows
      (4000L, -1L, -1L)))  // right rows exist but none precede
  }

  test("declared left-key partitioning: downstream same-key agg plans no extra exchange") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val left = Seq.tabulate(500)(i => (i.toLong, (i % 7).toLong, (i % 31).toLong))
      .toDF("lid", "user", "ts")
    val right = Seq.tabulate(500)(i => (10000L + i, (i % 7).toLong, (i % 29).toLong))
      .toDF("rid", "r_user", "r_ts")
    val joined = graft.plans.GraftOps.asofJoin(left, right,
      Seq(left("user")), Seq(right("r_user")),
      Seq(left("ts"), left("lid")), Seq(right("r_ts"), right("rid")))
    val agg = joined.groupBy("user")
      .agg(count(lit(1)).as("n"), count(col("rid")).as("n_matched"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("GraftAsOfJoin"), p)
    assert(!p.contains("Exchange"), s"downstream agg re-shuffled:\n$p")
    // values match the same aggregation over the window-formulation result
    val expected = {
      val l = left.withColumn("side", lit(1))
      // per (user): count rows and how many have a strictly-preceding right row
      import org.apache.spark.sql.expressions.Window
      val r = right.select(col("r_user").as("user"), col("r_ts").as("ts"),
        col("rid").as("oid"), lit(0).as("side")).withColumn("lid", lit(-1L))
      val u = l.select(col("user"), col("ts"), col("lid"), lit(-1L).as("oid"), col("side"))
        .unionByName(r.select(col("user"), col("ts"), col("lid"), col("oid"), col("side")))
      val w = Window.partitionBy("user").orderBy(col("ts"), col("oid"), col("lid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      u.withColumn("prev", last(when(col("side") === 0, col("oid")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .groupBy("user")
        .agg(count(lit(1)).as("n"), count(when(col("prev").isNotNull, 1)).as("n_matched"))
    }
    val norm = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(norm(agg.collect()) == norm(expected.collect()))
  }

  test("randomized: as-of join equals the unioned-window formulation under heavy ties") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 10 users, ts confined to 0..19 → constant cross-side ties; ids are
    // globally unique so the lexicographic (ts, id) order is total
    val lRows = Seq.tabulate(2000)(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(20).toLong))
    val rRows = Seq.tabulate(2000)(i =>
      (100000L + i, rnd.nextInt(10).toLong, rnd.nextInt(20).toLong))
    val left = lRows.toDF("lid", "user", "ts")
    val right = rRows.toDF("rid", "r_user", "r_ts")
    val got = graft.plans.GraftOps.asofJoin(left, right,
        Seq(left("user")), Seq(right("r_user")),
        Seq(left("ts"), left("lid")), Seq(right("r_ts"), right("rid")))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    // oracle: tag both sides, one window pass over the union
    val unioned = lRows.map(t => (t._1, t._2, t._3, false))
      .++(rRows.map(t => (t._1, t._2, t._3, true)))
      .toDF("id", "user", "ts", "is_right")
    val w = Window.partitionBy("user").orderBy(col("ts"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = unioned
      .withColumn("prev_rid",
        last(when(col("is_right"), col("id")), ignoreNulls = true).over(w))
      .filter(!col("is_right"))
      .select(col("id"), col("prev_rid"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    assert(got.length == 2000)
    assert(got.toSeq == expected.toSeq)
  }

  test("mismatched order-tuple types are rejected up front") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L)).toDF("a", "t")
    val r = Seq((1L, "x")).toDF("b", "u")
    val e = intercept[IllegalArgumentException] {
      graft.plans.GraftOps.asofJoin(l, r,
        Seq(l("a")), Seq(r("b")), Seq(l("t")), Seq(r("u")))
    }
    assert(e.getMessage.contains("identical types"))
  }
}
