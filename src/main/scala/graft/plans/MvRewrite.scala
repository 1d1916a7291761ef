package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, DecimalDivideWithOverflowCheck, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

/** MATERIALIZED-VIEW AUTOMATIC QUERY REWRITE — the warehouse capability
  * Spark itself lacks (Hive MV rewrite, BigQuery MV smart tuning): a query
  * over the facts is silently redirected to a precomputed MV, turning a
  * full fact scan + shuffle into a metadata-sized read. Two tiers:
  *
  *  - EXACT MATCH (m27): the query re-states the registered view
  *    definition verbatim — grouping list, aggregate list, and source all
  *    match — and becomes a plain MV scan. The BI-dashboard case.
  *  - CONTAINMENT (m28): the query is COARSER than the view — its grouping
  *    set is a subset of the view's and every aggregate is decomposable
  *    from the view's stored partials — and becomes a RE-AGGREGATION of
  *    the MV: `count(1)` re-sums the stored counts, `sum(x)` re-sums the
  *    stored per-group sums. Supported partials are the lossless ones:
  *    LONG counts and DECIMAL sums (the repo-wide exact-decimal
  *    discipline); DOUBLE sums are refused — floating re-aggregation
  *    reorders and is not answer-preserving. A rolled-up month view thus
  *    serves every year-level and whole-table rollup for free.
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
  * churn, alias indirection, and projection order all normalize away.
  * Both rewrites preserve the query's output schema and exprIds exactly
  * (every produced column is re-aliased — with a cast where decimal sum
  * widths differ — under the original output's exprId), so nothing
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

  /** How one stored MV column decomposes for containment rewriting. */
  private[plans] sealed trait ColKind
  private[plans] final case class GroupRef(sql: String) extends ColKind
  private[plans] case object CountStar extends ColKind
  private[plans] final case class CountOf(childSql: String) extends ColKind
  private[plans] final case class SumOf(childSql: String) extends ColKind
  private[plans] case object Opaque extends ColKind // exact-match only

  /** One registered view: the exact-match key (source root paths +
    * normalized sql of grouping and aggregate lists), the per-column
    * decomposition for containment, the MV parquet path, and the source
    * CONTENT FINGERPRINT captured at registration (file name/size/mtime
    * metadata of every source file — the same staleness discipline as the
    * BloomIndex/ZoneMap/IvfIndex `_ready` markers). */
  final case class Mv(name: String, sourcePaths: Set[String],
      groupSql: Seq[String], aggSql: Seq[String],
      private[plans] val cols: Seq[MvRegistry.ColKind], mvPath: String,
      private[plans] val sourceFp: String,
      private[plans] val childKey: String,
      private[plans] val filterSql: Option[String])

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
    // the MV parquet's column order follows the DataFrame's TOP-LEVEL
    // output; both rewrite tiers map MV columns positionally against the
    // Aggregate's output — a Project above the Aggregate (a reordering
    // select) would silently mis-map same-typed columns, so refuse it:
    // register the bare aggregate, reorder at query time
    val agg = plan match {
      case a: Aggregate => a
      case other => throw new IllegalArgumentException(
        s"mv $name: register the bare aggregate query (top operator is " +
          s"${other.nodeName}; a projection above the aggregate would " +
          "reorder the stored columns against the positional match key)")
    }
    val (paths, childKey, filt, g, a) = normalized(agg)
    require(paths.nonEmpty,
      s"mv $name: the view definition must scan a file source")
    val gSql = g.map(_.sql)
    mvs.put(name, Mv(name, paths, gSql, a.map(_.sql),
      a.map(colKind(_, gSql.toSet)), mvPath, fingerprint(paths), childKey,
      filt.map(_.sql)))
    ()
  }

  /** Source-content fingerprint: (relative name, size, mtime) of every data
    * file under the source roots — metadata-scale (one directory listing,
    * no data bytes). An MV whose source changed since registration is
    * REFUSED by the rewrite rule, so a regenerated table can never be
    * silently served from a stale MV; a SnapshotTable-backed deployment
    * would key on the committed version instead (cheaper, same contract). */
  private[plans] def fingerprint(paths: Set[String]): String = {
    def localPath(p: String): java.nio.file.Path = {
      val uri = java.net.URI.create(p.replace(" ", "%20"))
      if (uri.getScheme == "file") java.nio.file.Paths.get(uri)
      else java.nio.file.Paths.get(p)
    }
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    def walk(f: java.io.File, rel: String): Unit =
      if (f.isDirectory) {
        val cs = f.listFiles()
        if (cs != null) cs.sortBy(_.getName)
          .foreach(c => walk(c, s"$rel/${c.getName}"))
      } else if (!f.getName.startsWith(".") && !f.getName.startsWith("_"))
        entries += s"$rel:${f.length}:${f.lastModified}"
    paths.toSeq.sorted.foreach { p =>
      val root = localPath(p).toFile
      walk(root, root.getName)
    }
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(entries.mkString("\n").getBytes("UTF-8")))
  }

  /** Is this MV still fresh (source unchanged since registration)? */
  private[plans] def fresh(mv: Mv): Boolean =
    fingerprint(mv.sourcePaths) == mv.sourceFp

  def clear(): Unit = mvs.clear()

  def unregister(name: String): Unit = { mvs.remove(name); () }

  /** Classify one stored MV column for containment: a grouping
    * passthrough, a lossless partial (long count / decimal sum), or
    * opaque (exact-match only — e.g. a rounded or double aggregate). */
  private def colKind(e: NamedExpression, groupSqls: Set[String]): ColKind =
    e match {
      case Alias(child, _) => colKind0(child, groupSqls)
      case other           => colKind0(other, groupSqls)
    }

  private def colKind0(e: Expression, groupSqls: Set[String]): ColKind = e match {
    case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
      CountStar
    // count(col): the NON-NULL count partial — what Average's denominator
    // needs when the child is nullable (count(1) would over-count)
    case AggregateExpression(Count(Seq(c)), _, false, None, _) =>
      CountOf(c.sql)
    case AggregateExpression(s: Sum, _, false, None, _)
        if s.dataType.isInstanceOf[DecimalType] || s.dataType == LongType =>
      SumOf(s.child.sql)
    case g if groupSqls.contains(g.sql) => GroupRef(g.sql)
    case _                              => Opaque
  }

  /** Normalize an optimized Aggregate subtree: inline the child Project's
    * aliases (the `_groupingexpression` indirection
    * PullOutGroupingExpressions introduces, plus any computed columns) back
    * into the grouping/aggregate expressions; identify the SOURCE by its
    * file roots (cheap pre-filter) plus the canonicalized child plan (the
    * full identity — equal for two independently-built restatements of the
    * same scan/filter/JOIN body, exprIds normalized away). The child key is
    * what lets one registered JOIN view serve every coarser rollup of the
    * same join (m29). */
  private[plans] def normalized(
      agg: Aggregate): (Set[String], String, Option[Expression], Seq[Expression], Seq[NamedExpression]) = {
    val (c1, sub): (LogicalPlan, Expression => Expression) = agg.child match {
      case Project(list, gc) =>
        val m = list.collect { case al: Alias => al.exprId -> al.child }.toMap
        (gc, e => e.transformUp {
          case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
        })
      case c => (c, identity[Expression] _)
    }
    // peel ONE filter between the aggregate and the source body (the
    // optimizer pushes WHERE/HAVING predicates here and collapses stacks
    // into a single And) — the tier-4 filtered-containment input; the
    // filter's condition references scan attributes, so `sub` is a no-op
    // on it but applied for uniformity
    val (child, filt) = c1 match {
      case Filter(cond, gc) => (gc, Some(sub(cond)))
      case c                => (c, None)
    }
    (allScanPaths(child), childKeyOf(child), filt,
      agg.groupingExpressions.map(sub),
      agg.aggregateExpressions.map { e =>
        sub(e) match {
          // substituting a bare attr output for its defining expression
          // denames it — re-wrap under the SAME name/exprId
          case ne: NamedExpression => ne
          case x                   => Alias(x, e.name)(exprId = e.exprId)
        }
      })
  }

  /** The source-body identity: the child with pure COLUMN-SELECTION
    * Projects stripped, canonicalized (exprIds normalized). Stripping is
    * what makes the key PRUNING-INSENSITIVE: a coarser rollup references
    * fewer columns, so the optimizer prunes its join inputs differently —
    * but the join/filter/scan BODY is identical, which is the identity that
    * decides whether the stored partials answer the query. Projects that
    * COMPUTE anything stay in the key (a computed input changes answers). */
  private def childKeyOf(child: LogicalPlan): String =
    child.transformUp {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) => c
    }.canonicalized.toString

  /** Every file-source root path anywhere under the child (scans, joins of
    * scans, filters) — the cheap registration pre-filter. */
  private def allScanPaths(p: LogicalPlan): Set[String] =
    p.collect { case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case _                    => Set.empty[String]
    } }.flatten.toSet

  private def all: Iterator[Mv] = {
    import scala.jdk.CollectionConverters._
    mvs.values.iterator.asScala
  }

  /** Tier 1: the candidate IS the registered definition (same source BODY —
    * scan or join — same grouping, same aggregates, same filter). */
  private[plans] def lookupExact(paths: Set[String], childKey: String,
      filterSql: Option[String], gSql: Seq[String], aSql: Seq[String]): Option[Mv] =
    all.find(mv => mv.sourcePaths == paths && mv.childKey == childKey &&
      mv.filterSql == filterSql && mv.groupSql == gSql && mv.aggSql == aSql)

  /** Containment candidates: MVs over the same source body whose grouping
    * set contains the candidate's, and whose filter either equals the
    * candidate's (classic containment over the same slice) or is absent
    * while the candidate filters (tier 4 — the predicate is PUSHED onto
    * the MV scan, lossless iff it references only grouping columns). */
  private[plans] def containCandidates(paths: Set[String], childKey: String,
      filterSql: Option[String], gSql: Seq[String]): Seq[Mv] =
    all.filter(mv => mv.sourcePaths == paths && mv.childKey == childKey &&
      (mv.filterSql == filterSql || mv.filterSql.isEmpty) &&
      gSql.forall(mv.groupSql.contains)).toSeq

  private[plans] def isEmpty: Boolean = mvs.isEmpty

  /** Cheap pre-filter before any expression inspection: is this scan even
    * registered? */
  private[plans] def pathsRegistered(paths: Set[String]): Boolean =
    all.exists(_.sourcePaths == paths)
}

object GraftMvRewriteRule extends Rule[LogicalPlan] {

  import MvRegistry.{CountOf, CountStar, GroupRef, SumOf}

  val Flag = "spark.graft.mv.rewrite"

  /** The rule must NEVER break a query it cannot serve: an Aggregate the
    * registry doesn't cover is left untouched even if inspecting it throws
    * (`Expression.sql` is unsupported for some UDAF/internal expressions —
    * any such query simply keeps its own plan). */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean || MvRegistry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        try rewriteIfServed(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }

  private def rewriteIfServed(agg: Aggregate): LogicalPlan = {
    val (paths, childKey, filt, g, a) = MvRegistry.normalized(agg)
    if (paths.isEmpty || !MvRegistry.pathsRegistered(paths)) agg
    else MvRegistry.lookupExact(paths, childKey, filt.map(_.sql),
      g.map(_.sql), a.map(_.sql)).filter(MvRegistry.fresh) match {
      case Some(mv) => exactRewrite(agg, mv)
      case None =>
        if (g.isEmpty) agg // count()=0 over an empty MV would sum to NULL
        else MvRegistry.containCandidates(paths, childKey, filt.map(_.sql),
            g.map(_.sql)).view
          .filter(MvRegistry.fresh) // stale MV = refuse, read the facts
          .flatMap { mv =>
            // tier 4: only when the MV is unfiltered and the candidate
            // filters does a predicate need pushing onto the MV scan
            val push = if (mv.filterSql == filt.map(_.sql)) None else filt
            containRewrite(agg, g, a, push, mv)
          }
          .headOption.getOrElse(agg)
    }
  }

  /** Fresh relation instance per use (fresh exprIds, so one query may hit
    * the same MV twice). */
  private def mvScan(mv: MvRegistry.Mv): LogicalPlan =
    SparkSession.active.read.parquet(mv.mvPath).queryExecution.analyzed

  /** Tier 1: plain MV scan, columns re-aliased positionally under the
    * ORIGINAL output exprIds so every downstream reference keeps
    * resolving. */
  private def exactRewrite(agg: Aggregate, mv: MvRegistry.Mv): LogicalPlan = {
    val scan = mvScan(mv)
    require(scan.output.length == agg.output.length &&
      scan.output.zip(agg.output).forall { case (i, o) => i.dataType == o.dataType },
      s"mv ${mv.name}: stored schema ${scan.schema.simpleString} does " +
        s"not align with the aggregate's output ${agg.schema.simpleString}")
    Project(scan.output.zip(agg.output).map { case (in, out) =>
      Alias(in, out.name)(exprId = out.exprId)
    }, scan)
  }

  /** Tier 2: re-aggregate the MV. Each candidate output (after the
    * normalization inlining) may be an ARBITRARY expression over
    * decomposable pieces — the optimizer collapses final projections like
    * `round(cast(sum(...)))` INTO the aggregate list — so substitution is
    * structural: every fact-side AggregateExpression becomes a re-sum of
    * its stored partial (count(1) → sum(counts), sum(decimal|long) →
    * sum(partials), each cast back to the original result type — lossless,
    * the partial already fit), every grouping sub-expression becomes the
    * stored group column, and outer functions stay. Substitution recurses
    * manually so replacements are terminal (a transformDown would re-visit
    * the replacement's own Sum and reject it). If anything non-decomposable
    * remains — a double sum, count(col), a distinct, a filter clause, or
    * any surviving reference to the fact table — the rewrite REFUSES and
    * the query keeps its fact scan: answer preservation over cleverness. */
  private def containRewrite(agg: Aggregate, g: Seq[Expression],
      a: Seq[NamedExpression], push: Option[Expression],
      mv: MvRegistry.Mv): Option[LogicalPlan] = {
    val scan = mvScan(mv)
    val groupCol: Map[String, Expression] = mv.cols.zipWithIndex.collect {
      case (GroupRef(s), i) => s -> (scan.output(i): Expression)
    }.toMap
    val countCol: Option[Expression] = mv.cols.zipWithIndex.collectFirst {
      case (CountStar, i) => scan.output(i)
    }
    val countOfCol: Map[String, Expression] = mv.cols.zipWithIndex.collect {
      case (CountOf(s), i) => s -> (scan.output(i): Expression)
    }.toMap
    val sumCol: Map[String, Expression] = mv.cols.zipWithIndex.collect {
      case (SumOf(s), i) => s -> (scan.output(i): Expression)
    }.toMap
    def castTo(e: Expression, to: DataType): Expression =
      if (e.dataType == to) e else Cast(e, to)
    // Average's denominator is count(NON-NULL child): a stored count(child)
    // partial serves it always; the count(1) partial serves it only when
    // the child cannot be null (else the rewrite would divide by too many
    // rows and silently shrink the average — the r16 ADVICE defect)
    def denomFor(child: Expression): Option[Expression] =
      countOfCol.get(child.sql)
        .orElse(if (!child.nullable) countCol else None)
    def mapAgg(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) =>
          countCol.map(c => castTo(Sum(c).toAggregateExpression(), ae.dataType))
        case Count(Seq(c)) =>
          denomFor(c).map(x => castTo(Sum(x).toAggregateExpression(), ae.dataType))
        case s: Sum
            if s.dataType.isInstanceOf[DecimalType] || s.dataType == LongType =>
          sumCol.get(s.child.sql)
            .map(c => castTo(Sum(c).toAggregateExpression(), ae.dataType))
        // avg DECOMPOSITION (tier 3): avg(x) = resum(stored sums) /
        // resum(stored non-null counts), replayed through Average's own
        // decimal evaluate shape — Divide(sum, count cast to (20,0)) cast
        // to the avg result type — so the rewritten digits equal the
        // fact-side aggregate's exactly. DECIMAL children only: a double
        // avg's sum accumulates order-dependently and is refused like a
        // double sum.
        case av: Average if av.child.dataType.isInstanceOf[DecimalType] &&
            ae.dataType.isInstanceOf[DecimalType] =>
          for {
            sc <- sumCol.get(av.child.sql)
            cc <- denomFor(av.child)
          } yield {
            val factSumType = Sum(av.child).dataType // what Average divides
            val reSum = castTo(Sum(sc).toAggregateExpression(), factSumType)
            val reCnt = Cast(Sum(cc).toAggregateExpression(),
              DecimalType(20, 0)) // DecimalType.LongDecimal (private[sql])
            // Average's own decimal evaluate shape: a direct decimal divide
            // INTO the avg result type (a plain Divide would re-derive a
            // coarser scale and round early — measured 1e-7 vs the
            // fact-side 1e-10 digits). nullOnOverflow mirrors LEGACY mode.
            new DecimalDivideWithOverflowCheck(reSum, reCnt,
              ae.dataType.asInstanceOf[DecimalType], null,
              nullOnOverflow = true)
          }
        case _ => None
      }
    var ok = true
    def subst(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        mapAgg(ae).getOrElse { ok = false; ae }
      case e2 if groupCol.contains(e2.sql) => groupCol(e2.sql)
      case other => other.mapChildren(subst)
    }
    val g2 = g.map(ge => groupCol.get(ge.sql))
    if (g2.exists(_.isEmpty)) return None
    val a2 = a.zip(agg.output).map { case (out, orig) =>
      val r = out match {
        case al: Alias => subst(al.child)
        case other     => subst(other)
      }
      Alias(r, orig.name)(exprId = orig.exprId)
    }
    val mvAttrs = scan.outputSet
    if (!ok || a2.exists(x => !x.references.subsetOf(mvAttrs))) return None
    // tier 4: push the candidate's predicate onto the MV scan — lossless
    // exactly when every sub-expression it references maps to a stored
    // GROUPING column (each MV row aggregates one whole group, so a
    // group-column predicate selects whole groups); anything touching a
    // non-grouping fact column survives substitution as a fact reference
    // and is refused here
    val child: Option[LogicalPlan] = push match {
      case None => Some(scan)
      case Some(cond) =>
        val c2 = subst(cond)
        if (ok && c2.references.subsetOf(mvAttrs)) Some(Filter(c2, scan))
        else None
    }
    child.map(c => Aggregate(g2.map(_.get), a2, c))
  }
}
