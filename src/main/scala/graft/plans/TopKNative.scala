package graft.plans

import scala.collection.mutable

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LogicalFilter, LogicalPlan, Window => LogicalWindow, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** SURVEY §2 E1 scale path as a whole-operator Catalyst extension: a custom
  * physical operator (plus planner strategy) that executes the canonical
  * grouped top-k pattern
  *
  * {{{
  *   df.withColumn("rn_native", row_number().over(Window.partitionBy(p).orderBy(o)))
  *     .filter($"rn_native" <= k)
  * }}}
  *
  * WITHOUT ever sorting a partition. Spark's own plan for this shape is
  * Exchange → Sort(full partition) → Window(row_number) → Filter; since 3.5
  * the InferWindowGroupLimit rule pre-trims each map partition to k rows per
  * key (WindowGroupLimitExec) but still needs a full local sort before each
  * trim pass and a final per-partition sort before the Window. At 100 TB the
  * sort of a hot key's entire partition is the bottleneck. This operator
  * instead keeps a bounded selection buffer (≤ 2k rows) per key on the map
  * side, shuffles only the per-(input-partition × key) survivors, and merges
  * with the same bounded buffer on the reduce side — O(n) total with
  * O(keys × k) state, nothing larger than 2k rows is ever sorted, and rows
  * that cannot beat the current k-th best are dropped without even being
  * copied.
  *
  * The strategy only fires when the row_number alias is literally
  * `rn_native` — an explicit opt-in marker, so the library never hijacks a
  * user's ordinary window query (and the declared e1 window query keeps its
  * canonical Window plan for comparison). Registered session-wide by
  * [[graft.GraftExtensions]]; a one-off session can opt in with
  * `spark.experimental.extraStrategies`.
  *
  * Semantics note: output equals the window formulation whenever the window
  * ORDER BY is a total order (the same precondition e1/e1b already document;
  * under ties row_number itself is nondeterministic).
  */
object GraftTopKStrategy extends SparkStrategy {

  /** cond forms that mean "row_number ≤ k". */
  private[plans] object RnAtMost {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))    => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k))           => Some((a, k - 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute)        => Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1))            => Some((a, 1))
      case _                                                   => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LogicalFilter(RnAtMost(attr, k),
        w @ LogicalWindow(
          Seq(alias @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), "rn_native")),
          _, _, _, _))
        if k >= 1 && attr.exprId == alias.exprId =>
      // InferWindowGroupLimit may already have slipped its pre-trim between
      // the Window and the real input; our operator subsumes it.
      val input = w.child match {
        case wgl: WindowGroupLimit => wgl.child
        case c                     => c
      }
      GraftTopKPerKeyExec(k, part, order, alias.toAttribute,
        SQLConf.get.numShufflePartitions, planLater(input)) :: Nil
    case _ => Nil
  }
}

/** The third extension surface (alongside injected functions and planner
  * strategies): an optimizer `Rule[LogicalPlan]` that auto-rewrites the
  * canonical grouped top-k pattern — `Filter(rn ≤ k)` directly over a
  * single-expression `Window(row_number() AS rn)` with ANY alias — into the
  * opt-in shape [[GraftTopKStrategy]] plans natively, by renaming the window
  * alias to `rn_native` (exprId preserved, so every downstream reference and
  * the final output schema are untouched).
  *
  * Conf-gated, default OFF (`spark.graft.topk.autoRewrite=true` to enable):
  * under ties in the window ORDER BY, row_number is nondeterministic and the
  * bounded-selection operator may legitimately pick a different (equally
  * valid) top-k than the sort-based Window plan, so silently hijacking every
  * user window query is not acceptable library behavior — the user asserts
  * total order by flipping the flag. Registered session-wide by
  * [[graft.GraftExtensions]] via `injectOptimizerRule`; that lands it in the
  * operator-optimization batch, which runs BEFORE InferWindowGroupLimit, so
  * the renamed plan is exactly what the strategy expects (it strips any
  * later-inserted WindowGroupLimit anyway).
  */
object GraftTopKMarkRule extends Rule[LogicalPlan] {

  val Flag = "spark.graft.topk.autoRewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformUp {
      case f @ LogicalFilter(cond,
          w @ LogicalWindow(Seq(alias @ Alias(
            we @ WindowExpression(RowNumber(), WindowSpecDefinition(_, _, _)), name)),
            _, _, _, _)) if name != "rn_native" =>
        cond match {
          case GraftTopKStrategy.RnAtMost(attr, k)
              if k >= 1 && attr.exprId == alias.exprId =>
            f.copy(child = w.copy(windowExpressions = Seq(
              Alias(we, "rn_native")(alias.exprId, alias.qualifier,
                alias.explicitMetadata))))
          case _ => f
        }
    }
}

object GraftTopKPerKeyExec {

  /** Per-key bounded selection state: survivors plus the k-th-best fence
    * (valid once the buffer has been trimmed at least once). */
  private final class Entry {
    val buf = mutable.ArrayBuffer.empty[UnsafeRow]
    var fence: UnsafeRow = null
  }

  /** One bounded-selection pass over (key, row) pairs: per key, keep an
    * ArrayBuffer trimmed back to the best k whenever it reaches 2k
    * (amortized O(log k) per kept row), and skip rows that cannot beat the
    * current k-th best without copying them at all. Same discipline as
    * [[graft.functions.TopKAgg]] but over raw InternalRows, so it works for
    * any row shape / ordering, not one hardcoded (Double, Long) pair.
    * Returns the surviving ≤ k rows per key, unsorted.
    */
  private[plans] def boundedSelect(
      iter: Iterator[(UnsafeRow, UnsafeRow)],
      ord: Ordering[InternalRow],
      k: Int): mutable.HashMap[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]] = {
    val state = mutable.HashMap.empty[UnsafeRow, Entry]
    val rowOrd = ord.asInstanceOf[Ordering[UnsafeRow]]
    while (iter.hasNext) {
      val (key, row) = iter.next()
      // copy the (projection-reused) key only on first sight, not per lookup
      val e = state.get(key) match {
        case Some(x) => x
        case None    => val x = new Entry; state.put(key.copy(), x); x
      }
      if (e.fence == null || ord.compare(row, e.fence) < 0) {
        e.buf += row.copy()
        if (e.buf.length >= 2 * k) {
          val kept = e.buf.sorted(rowOrd).take(k)
          e.buf.clear(); e.buf ++= kept
          e.fence = kept.last
        }
      }
    }
    state.map { case (key, e) =>
      key -> (if (e.buf.length > k) e.buf.sorted(rowOrd).take(k) else e.buf)
    }
  }
}

/** Physical grouped top-k: map-side bounded selection → hash shuffle of
  * survivors → reduce-side bounded merge → emit rows with their 1-based
  * rank appended (the `rn_native` column the logical plan promised).
  */
final case class GraftTopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rnAttr: Attribute,
    numPartitions: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = orderSpec
    val limit = k
    val resultSchema = output

    val keyed: RDD[(UnsafeRow, UnsafeRow)] = child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput.map(a => a: Expression), childOutput)
      val ord = RowOrdering.create(order, childOutput)
      val state = GraftTopKPerKeyExec.boundedSelect(
        iter.map { r => (keyProj(r), rowProj(r)) }, ord, limit)
      state.iterator.flatMap { case (key, rows) => rows.iterator.map(r => (key, r)) }
    }

    keyed
      .partitionBy(new HashPartitioner(numPartitions))
      .mapPartitions { iter =>
        val ord = RowOrdering.create(order, childOutput)
        val merged = GraftTopKPerKeyExec.boundedSelect(iter, ord, limit)
        val joined = new JoinedRow
        val resultProj =
          UnsafeProjection.create(resultSchema.map(a => a: Expression), resultSchema)
        merged.iterator.flatMap { case (_, rows) =>
          val sorted = rows.sorted(ord.asInstanceOf[Ordering[UnsafeRow]])
          sorted.iterator.zipWithIndex.map { case (r, i) =>
            resultProj(joined(r, InternalRow(i + 1)))
          }
        }
      }
  }
}
