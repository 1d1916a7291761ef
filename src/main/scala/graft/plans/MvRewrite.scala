package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW AUTOMATIC QUERY REWRITE — the warehouse capability
  * Spark itself lacks (Hive MV rewrite, BigQuery MV smart tuning): a query
  * that re-states a registered view definition is silently redirected to
  * the precomputed MV table, turning a full fact scan + shuffle into a
  * metadata-sized read. This is the EXACT-MATCH tier of view rewriting —
  * the grouping expressions, aggregate list, and source table must all
  * match the registered definition (the BI-dashboard case, where the same
  * rollup is re-issued verbatim thousands of times a day); containment
  * rewriting (matching a coarser query against a finer MV) is the
  * documented next tier and reuses this registry.
  *
  * Matching is SEMANTIC on the OPTIMIZED plan shape, not textual: by the
  * time injected optimizer rules run, `PullOutGroupingExpressions` has
  * rewritten `Aggregate(year(d) AS yr, …)` into an Aggregate over
  * synthetic `_groupingexpression` attributes computed in a child Project
  * — so both the registered definition (captured from its own
  * `optimizedPlan`, which went through the same batches) and the candidate
  * subtree are NORMALIZED by inlining that child Project's aliases back
  * into the grouping/aggregate expressions and comparing resolved `sql`
  * forms, with the scan identified by its file-source root paths. ExprId
  * churn, alias indirection, and projection order all normalize away. The
  * rewrite preserves the query's output schema and exprIds exactly (each
  * MV column is re-aliased under the original output's exprId), so nothing
  * downstream re-resolves.
  *
  * Freshness is the registrar's contract: register the MV from the same
  * snapshot/version discipline that maintains it (m2's incremental MV,
  * m11's join MV) and re-register on refresh — a production deployment
  * keys the registry entry on the source table's committed version, which
  * is exactly what [[graft.sources.SnapshotTable]] metadata provides.
  *
  * Conf-gated, default OFF (`spark.graft.mv.rewrite=true`): hijacking a
  * user's scan is opt-in library behavior, same policy as
  * [[GraftTopKMarkRule]] and [[GraftLevBoundedRule]].
  */
object MvRegistry {

  /** One registered view: the match key (source root paths + normalized
    * sql of grouping and aggregate lists) and the MV parquet path. */
  final case class Mv(name: String, sourcePaths: Set[String],
      groupSql: Seq[String], aggSql: Seq[String], mvPath: String)

  private val mvs = new java.util.concurrent.ConcurrentHashMap[String, Mv]()

  /** Register `viewDf` (the defining aggregate query) as served by the
    * precomputed parquet at `mvPath`. The match key is captured from the
    * view's OPTIMIZED plan so it aligns with what the rewrite rule sees —
    * register with the rewrite flag OFF (the m27 discipline), or the
    * registration query could itself be rewritten. The caller owns
    * freshness. */
  def register(name: String, viewDf: org.apache.spark.sql.DataFrame,
      mvPath: String): Unit = {
    val plan = viewDf.queryExecution.optimizedPlan
    val agg = plan.collectFirst { case a: Aggregate => a }.getOrElse(
      throw new IllegalArgumentException(
        s"mv $name: the view definition must be an aggregate query"))
    val (paths, g, a) = normalized(agg)
    require(paths.nonEmpty,
      s"mv $name: the view definition must scan a file source")
    mvs.put(name, Mv(name, paths, g, a, mvPath))
    ()
  }

  def clear(): Unit = mvs.clear()

  /** Normalize an optimized Aggregate subtree to its match key: inline the
    * child Project's aliases (the `_groupingexpression` indirection
    * PullOutGroupingExpressions introduces, plus any computed columns) back
    * into the grouping/aggregate expressions, then key on resolved sql +
    * the underlying scan's root paths. */
  private[plans] def normalized(
      agg: Aggregate): (Set[String], Seq[String], Seq[String]) = {
    val (child, sub): (LogicalPlan, Expression => Expression) = agg.child match {
      case Project(list, gc) =>
        val m = list.collect { case al: Alias => al.exprId -> al.child }.toMap
        (gc, e => e.transformUp {
          case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
        })
      case c => (c, identity[Expression] _)
    }
    (scanPaths(child),
      agg.groupingExpressions.map(e => sub(e).sql),
      agg.aggregateExpressions.map(e => sub(e).sql))
  }

  /** File-source root paths under a (possibly column-pruning Project of a)
    * V1 relation — the scan identity the match keys on. */
  private def scanPaths(p: LogicalPlan): Set[String] = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case _                    => Set.empty
    }
    case _ => Set.empty
  }

  private[plans] def lookup(agg: Aggregate): Option[Mv] = {
    if (mvs.isEmpty) return None
    val (paths, g, a) = normalized(agg)
    if (paths.isEmpty) None
    else {
      val it = mvs.values.iterator
      var found: Option[Mv] = None
      while (found.isEmpty && it.hasNext) {
        val mv = it.next()
        if (mv.sourcePaths == paths && mv.groupSql == g && mv.aggSql == a)
          found = Some(mv)
      }
      found
    }
  }
}

object GraftMvRewriteRule extends Rule[LogicalPlan] {

  val Flag = "spark.graft.mv.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        MvRegistry.lookup(agg) match {
          case Some(mv) =>
            val spark = SparkSession.active
            // fresh relation instance per use (fresh exprIds, so one query
            // may hit the same MV twice); positional mapping MV column ->
            // aggregate output, re-aliased under the ORIGINAL exprIds so
            // every downstream reference keeps resolving
            val scan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
            require(scan.output.length == agg.output.length &&
              scan.output.zip(agg.output).forall { case (i, o) =>
                i.dataType == o.dataType },
              s"mv ${mv.name}: stored schema ${scan.schema.simpleString} does " +
                s"not align with the aggregate's output ${agg.schema.simpleString}")
            Project(scan.output.zip(agg.output).map { case (in, out) =>
              Alias(in, out.name)(exprId = out.exprId)
            }, scan)
          case None => agg
        }
    }
}
