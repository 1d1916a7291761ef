package graft.plans

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.operators.MergeInto
import graft.sources.SnapshotTable

/** SQL DML STATEMENT SURFACE over the snapshot-table warehouse band — the
  * bridge that makes MERGE / UPDATE / DELETE / time travel reachable from
  * plain `spark.sql(...)` (the pure-SQL quickstart), not only as library
  * calls. Spark's open-source session has no writable-table DML for v1
  * file sources; every lakehouse format ships exactly this piece as a
  * parser extension (`SparkSessionExtensions.injectParser`), which is what
  * [[graft.GraftExtensions]] does with [[GraftSqlParser]].
  *
  * A table NAME maps to a [[SnapshotTable]] root via [[GraftDmlRegistry]]
  * (the catalog a production deployment keeps in its metastore). Statements
  * whose target is a registered name are parsed here and become
  * `RunnableCommand`s over the existing machinery — everything else
  * delegates verbatim to Spark's parser, so the extension can never break a
  * query it does not serve (the MvRewrite discipline):
  *
  *  - `MERGE INTO t USING src ON t.k = src.k
  *       [WHEN MATCHED AND <col> = '<v>' THEN DELETE]
  *       WHEN MATCHED THEN UPDATE SET *
  *       WHEN NOT MATCHED THEN INSERT *`
  *    → [[graft.operators.MergeInto.applyChanges]] + snapshot commit. The
  *    CDC shape (`SET *` / `INSERT *`): per-column merge clauses compile to
  *    the same full-outer projection and are left to the library call.
  *  - `UPDATE t SET c = expr[, ...] [WHERE pred]` → conditional projection
  *    (each assignment cast back to the column's type) + snapshot commit.
  *  - `DELETE FROM t [WHERE pred]` → copy-on-write anti-filter + snapshot
  *    commit (the merge-on-read alternative is
  *    [[graft.sources.DeletionVectors]], m16 — a format with file manifests
  *    prunes the rewrite to touched files).
  *  - `SELECT ... FROM t [VERSION AS OF n] ...` → the registered name (and
  *    its `VERSION AS OF` form) resolves to the snapshot read; bare names
  *    resolve to LATEST. Rewritten textually to session temp views before
  *    delegation, so arbitrary SELECT syntax around them keeps working.
  *
  * Every write commits through the snapshot protocol: atomic pointer swap,
  * history preserved, time-travelable — DML at 100 TB is exactly as safe as
  * the underlying commit. Registered names are reserved identifiers for the
  * session (the textual read rewrite substitutes every word-boundary
  * occurrence outside our DML statements — don't name a table after a
  * column). Commands return their committed version + affected-row count,
  * the lakehouse convention.
  */
object GraftDmlRegistry {

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `name` as the SQL identifier of the snapshot table at
    * `root`. Names are case-insensitive, must be plain identifiers, and are
    * RESERVED within the session once registered. */
  def registerSnapshot(name: String, root: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"snapshot table name must be a plain identifier, got '$name'")
    tables.put(name.toLowerCase, root)
    ()
  }

  def rootOf(name: String): Option[String] =
    Option(tables.get(name.toLowerCase))

  private[plans] def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keys.asScala.toSeq
  }

  def unregister(name: String): Unit = { tables.remove(name.toLowerCase); () }

  def clear(): Unit = tables.clear()
}

/** `UPDATE t SET c = expr[, ...] [WHERE pred]` executed as a conditional
  * projection over the current snapshot, committed as the next version. */
case class GraftUpdateCommand(root: String, assigns: Seq[(String, String)],
    whereSql: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_updated", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = SnapshotTable.read(spark, root)
    val pred = whereSql.map(expr).getOrElse(lit(true))
    val byName = assigns.map { case (c, e) => c.toLowerCase -> e }.toMap
    require(byName.size == assigns.size, "UPDATE: duplicate SET column")
    val known = t.columns.map(_.toLowerCase).toSet
    byName.keys.foreach(c => require(known(c), s"UPDATE: unknown column $c"))
    val nUpd = t.filter(pred).count()
    val updated = t.select(t.schema.fields.map { f =>
      byName.get(f.name.toLowerCase) match {
        // cast back to the stored type so a widened assignment expression
        // (decimal arithmetic, int promotion) can't drift the table schema
        case Some(e) => when(pred, expr(e)).otherwise(col(f.name))
          .cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
    val v = SnapshotTable.commit(updated, root, meta = s"update:$nUpd")
    Seq(Row(v, nUpd))
  }
}

/** `DELETE FROM t [WHERE pred]` — copy-on-write: the next version carries
  * only the surviving rows; history keeps the deleted ones until expire. */
case class GraftDeleteCommand(root: String, whereSql: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val t = SnapshotTable.read(spark, root)
    val pred = whereSql.map(expr).getOrElse(lit(true))
    val nDel = t.filter(pred).count()
    val v = SnapshotTable.commit(t.filter(!pred), root, meta = s"delete:$nDel")
    Seq(Row(v, nDel))
  }
}

/** The CDC-shaped `MERGE INTO` (`UPDATE SET *` / `INSERT *`, optional
  * marker-column DELETE clause) over [[MergeInto.applyChanges]]. */
case class GraftMergeCommand(root: String, sourceSql: String, key: String,
    deleteWhen: Option[(String, String)]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val target = SnapshotTable.read(spark, root)
    val src = spark.sql(sourceSql)
    val ch = deleteWhen match {
      case Some((opc, del)) =>
        src.withColumn("__graft_op",
            when(col(opc) === del, "delete").otherwise("upsert"))
          .drop(opc)
      case None => src.withColumn("__graft_op", lit("upsert"))
    }
    val merged = MergeInto.applyChanges(target, ch, key, opCol = "__graft_op")
    val n = merged.count()
    val v = SnapshotTable.commit(merged, root, meta = s"merge:$n")
    Seq(Row(v, n))
  }
}

/** The delegating parser [[graft.GraftExtensions]] injects: intercepts DML
  * statements whose target name is registered, rewrites registered-name
  * reads (bare and `VERSION AS OF`) to snapshot temp views, and hands
  * everything else to Spark's parser untouched. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim
    val verb = t.takeWhile(!_.isWhitespace).toUpperCase
    val plan = verb match {
      case "MERGE"  => parseMerge(t)
      case "UPDATE" => parseUpdate(t)
      case "DELETE" => parseDelete(t)
      case _        => None
    }
    plan.getOrElse(delegate.parsePlan(rewriteReads(session, sqlText)))
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteReads(session, sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val UpdateRe: Regex =
    """(?is)^UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.*?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val DeleteRe: Regex =
    """(?is)^DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val MergeRe: Regex =
    """(?is)^MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+USING\s+(.+?)\s+ON\s+(.+?)\s+(WHEN\s+.+?)\s*;?\s*$""".r
  private val OnRe: Regex =
    """(?is)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r
  private val WhenDeleteRe: Regex =
    """(?is)WHEN\s+MATCHED\s+AND\s+(?:\w+\.)?(\w+)\s*=\s*'([^']*)'\s+THEN\s+DELETE""".r
  private val WhenUpdateRe: Regex =
    """(?is)WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""".r
  private val WhenInsertRe: Regex =
    """(?is)WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*""".r

  /** None = not ours (unregistered target / different shape): delegate. */
  private def parseUpdate(t: String): Option[LogicalPlan] = t match {
    case UpdateRe(name, setList, where) =>
      GraftDmlRegistry.rootOf(name).map { root =>
        val assigns = splitTopLevel(setList).map { a =>
          val eq = topLevelEq(a)
          require(eq > 0, s"UPDATE: malformed assignment '$a'")
          val c = a.substring(0, eq).trim
          require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"UPDATE: assignment target must be a column, got '$c'")
          c -> a.substring(eq + 1).trim
        }
        GraftUpdateCommand(root, assigns, Option(where).map(_.trim))
      }
    case _ => None
  }

  private def parseDelete(t: String): Option[LogicalPlan] = t match {
    case DeleteRe(name, where) =>
      GraftDmlRegistry.rootOf(name).map(root =>
        GraftDeleteCommand(root, Option(where).map(_.trim)))
    case _ => None
  }

  private def parseMerge(t: String): Option[LogicalPlan] = t match {
    case MergeRe(name, source, on, whens) =>
      GraftDmlRegistry.rootOf(name).map { root =>
        val key = on.trim match {
          case OnRe(_, k1, _, k2) =>
            require(k1.equalsIgnoreCase(k2),
              s"MERGE: ON must equate the same key column on both sides " +
                s"(got $k1 = $k2)")
            k1
          case other => throw new IllegalArgumentException(
            s"MERGE: unsupported ON clause '$other' — expected t.key = s.key")
        }
        require(WhenUpdateRe.findFirstIn(whens).isDefined,
          "MERGE: missing WHEN MATCHED THEN UPDATE SET *")
        require(WhenInsertRe.findFirstIn(whens).isDefined,
          "MERGE: missing WHEN NOT MATCHED THEN INSERT *")
        val deleteWhen = WhenDeleteRe.findFirstMatchIn(whens)
          .map(m => (m.group(1), m.group(2)))
        // source: a view/table name (optional alias) or a (subquery) alias
        val srcText = source.trim
        val srcSql =
          if (srcText.startsWith("(")) {
            val close = matchParen(srcText)
            srcText.substring(1, close)
          } else s"SELECT * FROM ${srcText.split("\\s+").head}"
        GraftMergeCommand(root, srcSql, key, deleteWhen)
      }
    case _ => None
  }

  /** Substitute registered-name reads with snapshot temp views: the
    * `VERSION AS OF n` form reads that committed version; a bare name reads
    * LATEST. Word-boundary textual substitution (registered names are
    * reserved), applied only when a registered name actually occurs. */
  private def rewriteReads(session: SparkSession, sql: String): String = {
    val names = GraftDmlRegistry.names
    if (names.isEmpty) return sql
    var out = sql
    names.foreach { name =>
      if (out.toLowerCase.contains(name)) {
        val root = GraftDmlRegistry.rootOf(name).get
        val vPat = ("(?i)\\b" + Regex.quote(name) +
          "\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)").r
        out = vPat.replaceAllIn(out, m => {
          val v = m.group(1).toLong
          val view = s"__graft_snap_${name}_v$v"
          SnapshotTable.readVersion(session, root, v)
            .createOrReplaceTempView(view)
          view
        })
        val bPat = ("(?i)\\b" + Regex.quote(name) + "\\b").r
        if (bPat.findFirstIn(out).isDefined) {
          val view = s"__graft_snap_${name}_latest"
          SnapshotTable.read(session, root).createOrReplaceTempView(view)
          out = bPat.replaceAllIn(out, view)
        }
      }
    }
    out
  }

  /** Split on commas at paren depth 0, outside string literals. */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          parts += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start)
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Index of the first '=' at paren depth 0 outside literals (the
    * assignment operator — the RHS may itself contain '='). */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case '=' if !inStr && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Index of the ')' matching the '(' at position 0. */
  private def matchParen(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"MERGE: unbalanced parens in '$s'")
  }
}
