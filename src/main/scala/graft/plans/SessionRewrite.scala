package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, CreateNamedStruct, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, EventTimeWatermark, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** AUTO-REWRITE of the built-in streaming `session_window` count aggregate
  * to the timer sessionizer ([[graft.streaming.SessionWindowProcessor]]) —
  * the e1d pattern applied to sessionization: the user keeps the declarative
  * API (`groupBy(session_window(ts, gap), key).count()`), and a conf-gated
  * rule swaps the execution to the shape that is ~2× faster at sf10 and
  * scales with state parallelism (the built-in's UpdatingSessions/
  * MergingSessions execs sort and re-serialize every key's sessions through
  * the state store per micro-batch — 145 s at sf10, flat in partitions; the
  * r15 finding).
  *
  * Injected as a POST-HOC RESOLUTION rule, not an optimizer rule: streaming
  * queries re-run the optimizer per micro-batch over a plan whose stateful
  * operators were placed at query start, so an execution-shape swap must
  * happen ONCE, during analysis, before the stream starts — which is
  * exactly when post-hoc resolution runs.
  *
  * Matches the analyzed shape of exactly
  * `stream.withWatermark(ts, d).groupBy(session_window(ts, gap), key)
  *   .agg(count(lit(1)))` with a bigint key — anything else (extra
  * aggregates, non-count, static plans) is left untouched, and any
  * exception inside the matcher keeps the original plan (the MvRewrite
  * never-break discipline). Output attributes are re-aliased under the
  * original exprIds, so downstream references keep resolving.
  *
  * Semantics contract (pinned by i3b carrying i3's full value oracle): the
  * emitted append-mode set is identical — sessions merge at ts < last+gap
  * in any within-batch arrival order, emit when the watermark passes
  * last+gap. Cross-batch out-of-order arrival ABOVE the watermark is
  * handled by the session map exactly like the built-in merges sessions;
  * rows BELOW the watermark are dropped by the engine either way.
  */
class GraftSessionRewriteRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftSessionRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        try rewriteIfSessionCount(session, agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }
}

object GraftSessionRewriteRule {

  val Flag = "spark.graft.session.autoRewrite"

  private def rewriteIfSessionCount(spark: SparkSession,
      agg: Aggregate): LogicalPlan = agg match {
    case Aggregate(Seq(sw: AttributeReference, key: AttributeReference),
        Seq(o1: AttributeReference, o2: AttributeReference,
          cnt @ Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _)),
        Filter(_, Project(projList,
          wm @ EventTimeWatermark(_, _, _, _))), _)
        if sw.name == "session_window" && key.dataType == LongType &&
          o1.exprId == sw.exprId && o2.exprId == key.exprId &&
          agg.isStreaming =>
      // the session struct the analyzer expanded: start = ts, end = ts + gap
      val structAlias = projList.collectFirst {
        case a @ Alias(s: CreateNamedStruct, _) if a.exprId == sw.exprId => s
      }.getOrElse(return agg)
      val ts = structAlias.collectFirst {
        case a: AttributeReference if a.dataType == TimestampType => a
      }.getOrElse(return agg)
      // at analysis time the gap is a foldable interval expression (the
      // optimizer hasn't constant-folded the cast yet)
      val gapUs = structAlias.collectFirst {
        case e if e.dataType == CalendarIntervalType && e.foldable =>
          e.eval() match {
            case ci: CalendarInterval if ci.months == 0 =>
              ci.days * 86400000000L + ci.microseconds
            case _ => return agg
          }
      }.getOrElse(return agg)
      if (gapUs <= 0) return agg

      // rebuild over the SAME watermarked source through the typed API —
      // the replacement subtree contains no session_window, so the
      // re-entrant analysis below terminates
      val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val src = org.apache.spark.sql.classic.GraftSqlBridge.ofRows(cs, wm)
      import org.apache.spark.sql.functions._
      import cs.implicits._
      val out = src
        .select(org.apache.spark.sql.classic.GraftSqlBridge.column(key),
          unix_micros(org.apache.spark.sql.classic.GraftSqlBridge.column(ts)))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.SessionWindowProcessor(gapUs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("k", "s_us", "e_us", "n")
        .select(
          struct(timestamp_micros(col("s_us")).as("start"),
            timestamp_micros(col("e_us")).as("end")).as("session_window"),
          col("k"), col("n"))
      val lp = out.queryExecution.analyzed
      // preserve the aggregate's output identities (the MvRewrite
      // discipline): schema AND exprIds must survive the swap
      val outs: Seq[NamedExpression] = Seq(sw, key, cnt.toAttribute)
      Project(lp.output.zip(outs).map { case (in, o) =>
        Alias(in, o.name)(exprId = o.exprId)
      }, lp)
    case _ => agg
  }
}
