package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Two-level (day + edge-hour) interval binning for the overlap join (c16).
  *
  * Exploding an interval to EVERY covered hour is linear in interval length —
  * a pathological days-long session inflates the join input 24× per day. The
  * two-level cover bounds the fan-out: full days collapse to ONE day bin
  * each, and only the partial-day edges emit hour bins (≤ 46 of them, ever).
  * A 10-day session emits ≤ 10 + 46 bins instead of 240 hourly ones.
  *
  * Exactness (why every overlapping pair still meets): any overlap contains
  * a point t. t's hour lies in exactly one cover bin of the long side — an
  * edge hour ('h', hour(t)) or a full day ('d', day(t)). The short side
  * (`probeBins`) emits BOTH all its hours as 'h' bins and each of their days
  * as 'd' bins, so the equi-join on (kind, bin) matches in either case; the
  * exact overlap predicate then runs as a residual filter and DISTINCT
  * collapses multiplicity — identical semantics to the theta join, which is
  * what the oracle replays.
  *
  * Inputs are hour-truncated bounds `hs`/`he` plus the full-day range
  * `fd0`/`fd1` (see [[withBounds]]); all four are plain columns so the
  * sequence/transform pipeline stays codegen-friendly.
  */
object IntervalCover {

  private val emptyBins = "CAST(array() AS ARRAY<STRUCT<kind: STRING, b: TIMESTAMP_NTZ>>)"
  private val emptyHours = "CAST(array() AS ARRAY<TIMESTAMP_NTZ>)"

  /** Adds hs/he (hour-truncated bounds) and fd0/fd1 (first/last fully-covered
    * day, fd0 > fd1 when none) for the interval [startCol, endCol]. */
  def withBounds(df: org.apache.spark.sql.DataFrame, startCol: String, endCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("hs", expr(s"date_trunc('HOUR', $startCol)"))
      .withColumn("he", expr(s"date_trunc('HOUR', $endCol)"))
      .withColumn("fd0", expr(
        "IF(hs = date_trunc('DAY', hs), date_trunc('DAY', hs), date_trunc('DAY', hs) + INTERVAL 1 DAY)"))
      .withColumn("fd1", expr(
        "IF(he = date_trunc('DAY', he) + INTERVAL 23 HOUR, date_trunc('DAY', he), date_trunc('DAY', he) - INTERVAL 1 DAY)"))

  /** Minimal cover of the interval: one 'd' bin per fully-covered day plus
    * 'h' bins for the partial-day edges. Expects [[withBounds]] columns. */
  def coverBins: Column = expr(
    s"""concat(
       |  IF(fd0 <= fd1,
       |     transform(sequence(fd0, fd1, INTERVAL 1 DAY),
       |               d -> named_struct('kind', 'd', 'b', d)),
       |     $emptyBins),
       |  transform(
       |    CASE WHEN fd0 > fd1 THEN sequence(hs, he, INTERVAL 1 HOUR)
       |         ELSE concat(
       |           IF(hs < fd0,
       |              sequence(hs, fd0 - INTERVAL 1 HOUR, INTERVAL 1 HOUR),
       |              $emptyHours),
       |           IF(fd1 + INTERVAL 24 HOUR <= he,
       |              sequence(fd1 + INTERVAL 24 HOUR, he, INTERVAL 1 HOUR),
       |              $emptyHours))
       |    END,
       |    h -> named_struct('kind', 'h', 'b', h)))""".stripMargin)

  /** Probe-side bins for a SHORT interval: every covered hour as an 'h' bin
    * plus each distinct day of those hours as a 'd' bin — so it meets a long
    * interval's cover whichever level the overlap point fell on. Fan-out is
    * hours + days, fine for bounded probe windows (c16's are 30 minutes). */
  def probeBins(startCol: String, endCol: String): Column = expr(
    s"""concat(
       |  transform(sequence(date_trunc('HOUR', $startCol), date_trunc('HOUR', $endCol), INTERVAL 1 HOUR),
       |            h -> named_struct('kind', 'h', 'b', h)),
       |  transform(array_distinct(transform(
       |              sequence(date_trunc('HOUR', $startCol), date_trunc('HOUR', $endCol), INTERVAL 1 HOUR),
       |              h -> date_trunc('DAY', h))),
       |            d -> named_struct('kind', 'd', 'b', d)))""".stripMargin)
}
