package graft

import org.scalatest.funsuite.AnyFunSuite

/** I1–I8 semantics under Trigger.AvailableNow over the chunked source. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val totalEvents = Tables(spark, sfDir).events.count()

  test("i1: complete-mode tumbling counts cover every event") {
    val n = SparkEntry.queries("i1_stream_tumbling")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(n == totalEvents)
  }

  test("i4: append mode with watermark drops late chunks") {
    val n = SparkEntry.queries("i4_stream_watermark_late")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(n > 0 && n < totalEvents, s"expected some-but-not-all events, got $n/$totalEvents")
  }

  test("i5: in-stream duplicates are collapsed") {
    val n = SparkEntry.queries("i5_stream_dedup")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    // each event duplicated ×2 in-stream; dedup must never exceed the original count
    assert(n > 0 && n <= totalEvents, s"dedup emitted $n of $totalEvents")
  }

  test("i6: stateful per-user counters account for every event") {
    val total = SparkEntry.queries("i6_stream_stateful")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_total")).head().getLong(0)
    assert(total == totalEvents)
  }

  test("i9: stream-stream join emits bounded click-purchase pairs") {
    val rows = SparkEntry.queries("i9_stream_stream_join")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // upper bound: can never exceed clicks × purchases of the same user
    val byUser = Tables(spark, sfDir).events
      .groupBy("user_id").pivot("event_type", Seq("click", "purchase")).count()
      .na.fill(0L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (c, p) = byUser(r.getLong(0))
      assert(r.getLong(1) <= c * p, s"user ${r.getLong(0)}: ${r.getLong(1)} > $c*$p")
    }
  }

  test("i8: one batch per source chunk") {
    val batches = SparkEntry.queries("i8_stream_sink")(spark, sfDir).count()
    assert(batches == 4)
  }
}
