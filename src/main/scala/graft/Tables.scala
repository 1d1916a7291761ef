package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources (SURVEY.md §2 A): all fixture tables for one scale-factor dir.
  *
  * Design notes (100 TB): each accessor is a plain parquet scan, so Catalyst
  * predicate pushdown / column pruning / partition pruning apply untouched.
  * Nothing is cached or collected here; a real deployment would point these
  * at partitioned table roots instead of single files.
  */
final class Tables(val spark: SparkSession, val sfDir: String) {

  private def read(name: String): DataFrame =
    Tables.readCached(spark, s"$sfDir/$name.parquet")

  def region: DataFrame     = read("region")
  def nation: DataFrame     = read("nation")
  def customer: DataFrame   = read("customer")
  def supplier: DataFrame   = read("supplier")
  def part: DataFrame       = read("part")
  def orders: DataFrame     = read("orders")
  def lineitem: DataFrame   = read("lineitem")
  def documents: DataFrame  = read("documents")
  def embeddings: DataFrame = read("embeddings")

  /** events.ts: dtype-adaptive to the fixture's physical timestamp layout.
    * Older fixture generations wrote parquet timestamp[ns], which Spark 4
    * refuses by default — with nanosAsLong it arrives as LongType, and we
    * integral-divide to µs (`div`, not double `/`: ~1.7e18 ns does not fit
    * double's 53-bit mantissa; values are whole µs so this is lossless).
    * Current fixtures write timestamp[us], which arrives as a timestamp
    * already — just pin it to NTZ. Either path lands on the same µs
    * instants the DuckDB oracle sees.
    */
  def events: DataFrame = {
    val df = read("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Raw schema of `events` as Spark reads the current fixture file (needed
    * by streaming reads, which require an explicit schema). Derived from the
    * actual footer instead of hardcoded, so fixture-generation drift (ns as
    * long vs native µs timestamp) cannot desynchronize it from `events`. */
  def eventsRawSchema: StructType = read("events").schema
}

object Tables {
  /** Session-wide reader/writer settings, applied once per Tables handle
    * (idempotent): µs-precision parquet output (the driver's DuckDB compare
    * reads our dumps) and nanos-as-long for the events table (SURVEY §1.2).
    */
  def apply(spark: SparkSession, sfDir: String): Tables = {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new Tables(spark, sfDir)
  }

  /** Analyzed-scan cache for the fixture tables — the in-session equivalent
    * of a metastore catalog entry. Measured (r21): every bare
    * `spark.read.parquet(path)` pays ~60-90 ms of driver-side source
    * resolution + footer schema inference, and every query re-resolves each
    * table it touches (the SQL band's 9-view registration alone cost
    * ~0.7 s/query) — pure METADATA work a catalog does once. The cached
    * object is the immutable analyzed DataFrame (logical plan only — no
    * rows, no results: every execution still scans the parquet), keyed on
    * (session, path, size, mtime) so a regenerated fixture invalidates
    * (the shingleSetsCache discipline: identityHashCode collisions re-check
    * session identity, stale same-path entries are dropped eagerly, and
    * entries of stopped sessions are swept once the map grows). */
  private val scanCache = boundedLru[DataFrame](64)
  private[graft] def readCached(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val prefix = s"${System.identityHashCode(spark)}:$path:"
    val key = s"$prefix${f.length()}:${f.lastModified()}"
    val hit = scanCache.get(key)
    if (hit != null && (hit.sparkSession eq spark)) return hit
    scanCache.keySet.removeIf(k => k.startsWith(prefix) && k != key)
    val df = spark.read.parquet(path)
    scanCache.put(key, df)
    df
  }
  private[graft] def scanCacheSize: Int = scanCache.size()

  /** Bounded access-order LRU, hard-capped at `cap` entries — the r22 fix
    * for the r21 verdict's unbounded-cache nit: a single long-lived session
    * reading more than `cap` distinct paths now evicts the least-recently-
    * used entry instead of growing forever (the old code only swept entries
    * of STOPPED sessions). Entries are analyzed logical plans (metadata
    * scale), so the cap is about predictability, not leak pressure.
    * Synchronized — callers touch it from concurrent test sessions. */
  private[graft] def boundedLru[V](cap: Int): java.util.Map[String, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
          size() > cap
      })

  /** In-session memo for CONTENT-FINGERPRINT jobs (r22, §1.2 don't recompute
    * what cannot have changed): the persisted-index freshness checks
    * (IvfIndex/IvfPqIndex `_ready`, the pair-index commit meta, g49's index
    * fingerprint) each run a small distributed CRC aggregation over their
    * source table PER INVOCATION — ~0.1-0.2 s of pure re-verification per
    * query per bench pass. The memo keys on (session identity, caller tag,
    * the source scan's input FILES with their size+mtime) — all metadata —
    * and stores the computed fingerprint string: while the underlying files
    * are byte-identical the fingerprint is a pure function of them, so the
    * memoized value IS the recomputation's result (the same (size, mtime)
    * staleness contract as readCached / the chunkedSource staging). An
    * input without resolvable files (in-memory test frames) skips the memo
    * and computes directly. */
  private val fpMemo = boundedLru[String](256)
  private[graft] def memoFingerprint(df: DataFrame, tag: String)(
      compute: => String): String = {
    val files = try df.inputFiles.sorted.toSeq catch { case _: Throwable => Seq.empty }
    if (files.isEmpty) return compute
    val meta = files.map { u =>
      val p = try new java.io.File(new java.net.URI(u)) catch {
        case _: Throwable => new java.io.File(u)
      }
      s"$u=${p.length()}:${p.lastModified()}"
    }.mkString(",")
    val key = s"${System.identityHashCode(df.sparkSession)}:$tag:$meta"
    val hit = fpMemo.get(key)
    if (hit != null) return hit
    val fp = compute
    fpMemo.put(key, fp)
    fp
  }

  /** Collision-free tmp-path key for a fixture dir: the full sanitized path
    * PLUS a CRC of the original string — sanitization alone is not injective
    * (`sf0.1` and `sf0_1` both sanitize to `sf0_1`), and two dirs keying
    * alike must not share mutable index state (the check-then-commit
    * fingerprint/rmrf sites have no locking). CRC32 (not hashCode) so the
    * key is stable across JVMs. */
  def pathKey(dir: String): String = {
    val crc = new java.util.zip.CRC32
    crc.update(dir.getBytes("UTF-8"))
    // identifier-safe (doubles as a SQL table-name suffix): [A-Za-z0-9_] only
    dir.replaceAll("[^A-Za-z0-9_]", "_").stripPrefix("_") +
      "_" + java.lang.Long.toHexString(crc.getValue)
  }

  /** DECIMAL(27,6) — enough integer digits for any sf0.1 money sum. */
  val dec: DecimalType = DecimalType(27, 6)
  /** High-scale decimal for unit-magnitude vector components (G6). */
  val decHi: DecimalType = DecimalType(38, 12)

  /** Exact, order-independent SUM over a double column: sum in DECIMAL(27,6)
    * (so partial-aggregation merge order can never change the result — the
    * whole point at 1000-executor scale), then back to double. The DuckDB
    * oracle does the same: CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE).
    */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(27, 6))).cast("double")

  /** Matching oracle fragment. */
  def dsumSql(x: String): String = s"CAST(sum(CAST(($x) AS DECIMAL(27,6))) AS DOUBLE)"

  /** Order-independent AVG: exact decimal sum, one double division. */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(c.cast(DecimalType(27, 6))).cast("double") / count(c)).cast("double")

  def davgSql(x: String): String =
    s"(CAST(sum(CAST(($x) AS DECIMAL(27,6))) AS DOUBLE) / count($x))"

  /** Timestamps must leave the engine as TIMESTAMP_NTZ: Spark's TimestampType
    * writes parquet `isAdjustedToUTC=true`, which DuckDB reads as TIMESTAMPTZ
    * and the oracle compare then sees a type mismatch. Session TZ is pinned
    * UTC, so the cast preserves the wall-clock value.
    */
  def ntz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("timestamp_ntz")

  /** Total order over every output column — the safe ORDER BY for outputs
    * without a unique key (lineitem has none). Oracle side: ORDER BY ALL.
    * Only valid when no output column is nullable (DuckDB defaults to
    * NULLS LAST, Spark to NULLS FIRST) — nullable queries spell it out.
    */
  def orderAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
}
