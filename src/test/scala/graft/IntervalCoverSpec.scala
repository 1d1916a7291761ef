package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.operators.IntervalCover — the two-level (day + edge-hour) binning
  * behind c16's overlap join: bounded fan-out for long intervals, exact
  * pair-set equality with the plain theta join.
  */
class IntervalCoverSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.IntervalCover

  private def ntz(s: String) = lit(s).cast("timestamp_ntz")

  test("multi-day interval emits bounded two-level cover, not hourly blow-up") {
    val s = spark
    // 10-day session: hourly binning would emit ~246 bins; the two-level
    // cover is 9 full days + <=46 edge hours
    val df = s.range(1).select(
      ntz("2024-01-01 05:30:00").as("st"), ntz("2024-01-11 13:10:00").as("en"))
    val bins = IntervalCover.withBounds(df, "st", "en")
      .select(explode(IntervalCover.coverBins).as("bin"))
      .select(col("bin.kind").as("kind"), col("bin.b").as("b"))
      .collect()
    val dayBins = bins.filter(_.getString(0) == "d")
    val hourBins = bins.filter(_.getString(0) == "h")
    assert(dayBins.length == 9, s"full days 01-02..01-10? got ${dayBins.length}")
    assert(hourBins.length <= 46, s"edge hours bounded, got ${hourBins.length}")
    assert(bins.length < 60 && bins.length < 246 / 3)
  }

  test("interval fully inside one day emits hour bins only") {
    val s = spark
    val df = s.range(1).select(
      ntz("2024-03-05 09:15:00").as("st"), ntz("2024-03-05 11:45:00").as("en"))
    val bins = IntervalCover.withBounds(df, "st", "en")
      .select(explode(IntervalCover.coverBins).as("bin"))
      .select(col("bin.kind")).collect().map(_.getString(0))
    assert(bins.forall(_ == "h") && bins.length == 3) // 09, 10, 11
  }

  test("exact-midnight-aligned interval is all day bins") {
    val s = spark
    val df = s.range(1).select(
      ntz("2024-03-05 00:00:00").as("st"), ntz("2024-03-07 23:00:00").as("en"))
    val bins = IntervalCover.withBounds(df, "st", "en")
      .select(explode(IntervalCover.coverBins).as("bin"))
      .select(col("bin.kind")).collect().map(_.getString(0))
    assert(bins.forall(_ == "d") && bins.length == 3)
  }

  test("binned join + residual equals the plain theta join on random intervals") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random interval sets (splitmix-ish from a seed)
    var state = 42L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % mod + mod) % mod).toInt
    }
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    def ts(minutes: Int) = java.sql.Timestamp.valueOf(base.plusMinutes(minutes.toLong))
    // long side: 40 intervals, up to ~5 days each
    val longs = (0 until 40).map { i =>
      val st = next(10000); val len = 1 + next(7200)
      (i.toLong, ts(st), ts(st + len))
    }
    // short side: 60 intervals, up to 2 hours each
    val shorts = (0 until 60).map { i =>
      val st = next(12000); val len = 1 + next(120)
      (i.toLong, ts(st), ts(st + len))
    }
    val lf = longs.toDF("lid", "lst", "len_")
      .select(col("lid"), col("lst").cast("timestamp_ntz").as("lst"),
        col("len_").cast("timestamp_ntz").as("lend"))
    val sf = shorts.toDF("sid", "sst", "send_")
      .select(col("sid"), col("sst").cast("timestamp_ntz").as("sst"),
        col("send_").cast("timestamp_ntz").as("send"))
    val theta = lf.join(sf, col("lst") <= col("send") && col("lend") >= col("sst"))
      .select("lid", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lb = IntervalCover.withBounds(lf, "lst", "lend")
      .withColumn("bin", explode(IntervalCover.coverBins))
      .select(col("lid"), col("lst"), col("lend"), col("bin"))
    val sb = sf.withColumn("bin", explode(IntervalCover.probeBins("sst", "send")))
    val binned = lb.join(sb, "bin")
      .filter(col("lst") <= col("send") && col("lend") >= col("sst"))
      .select("lid", "sid").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == theta,
      s"missing=${(theta -- binned).take(5)} extra=${(binned -- theta).take(5)}")
  }
}
