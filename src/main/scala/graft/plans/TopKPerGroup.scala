package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

import scala.collection.mutable

/** A whole custom operator through the full Catalyst stack (the (c) level
  * of the extension preference order): top-k per group.
  *
  * The DataFrame idiom
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(g).orderBy(o)))
  *      .filter($"rn" <= k) }}}
  * makes Spark shuffle EVERY row of the child and sort every full group,
  * even though only k rows per group survive. `TopKRewrite` (an optimizer
  * `Rule[LogicalPlan]`) recognizes the idiom and replaces it with a
  * [[TopKPerGroup]] logical node; `TopKStrategy` plans that as
  *
  *   TopKPerGroupExec (final, requires clustering by g)
  *     <- exchange inserted by EnsureRequirements
  *       <- LocalTopKExec (partial, per input partition)
  *
  * LocalTopKExec keeps at most k rows per group per input partition in a
  * bounded heap before anything shuffles — the same shape as partial
  * aggregation, and the difference between shuffling 100 TB and shuffling
  * k·|groups| rows.
  *
  * Injected per session via `spark.experimental.extraOptimizations` /
  * `extraStrategies` (see [[TopKPerGroup.install]]).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Make the rewrite + strategy active on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_ eq TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    if (!spark.experimental.extraStrategies.exists(_ eq TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}

/** Optimizer rule: Filter(rn <= k) over Window([row_number() as rn]) →
  * TopKPerGroup. Fires only on the exact idiom (single row_number window
  * expression, filter directly on its attribute with a literal bound). */
object TopKRewrite extends Rule[LogicalPlan] {

  /** The row_number attribute, possibly under an order-preserving widening
    * cast: `row_number().over(w).cast("long")` is the common idiom for
    * oracle schema parity (int32 vs int64), and filter pushdown rewrites
    * the rank predicate to `Cast(rn) <= k` — the rewrite must still fire. */
  private def isRn(e: Expression, rn: Attribute): Boolean = e match {
    case a: Attribute => a.semanticEquals(rn)
    case c: Cast if c.dataType == LongType && c.child.dataType == IntegerType =>
      isRn(c.child, rn)
    case _ => false
  }

  private def intVal(l: Literal): Option[Int] = l match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a, l: Literal) if isRn(a, rn) => intVal(l)
    case LessThan(a, l: Literal) if isRn(a, rn) => intVal(l).map(_ - 1)
    case GreaterThanOrEqual(l: Literal, a) if isRn(a, rn) => intVal(l)
    case GreaterThan(l: Literal, a) if isRn(a, rn) => intVal(l).map(_ - 1)
    // rn = 1 is top-1 per group (argmax — the IVF cell-assignment idiom)
    case EqualTo(a, l: Literal) if isRn(a, rn) && intVal(l).contains(1) => Some(1)
    case EqualTo(l: Literal, a) if isRn(a, rn) && intVal(l).contains(1) => Some(1)
    case _ => None
  }

  private def asTopK(cond: Expression, w: logical.Window): Option[TopKPerGroup] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)) =>
        // Spark's own InferWindowGroupLimit has usually already inserted a
        // (sort-based) WindowGroupLimit under the window by the time extra
        // optimizations run — peel it off so the heap operator REPLACES
        // the builtin sort+limit chain instead of stacking on top of it
        val realChild = w.child match {
          case wgl: logical.WindowGroupLimit
              if wgl.partitionSpec == ps && wgl.orderSpec == os => wgl.child
          case c => c
        }
        bound(cond, alias.toAttribute).collect {
          case k if k >= 0 => TopKPerGroup(ps, os, k, alias.toAttribute, realChild)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: logical.Window) =>
      asTopK(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: logical.Window))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      asTopK(cond, w).map(t => Project(projList, t)).getOrElse(f)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(ps, os, k, rn, child) =>
      val planned = planLater(child)
      TopKPerGroupExec(ps, os, k, rn,
        LocalTopKExec(ps, os, k, planned)) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: keep the k smallest rows (w.r.t. the window
  * ordering) per group key within one partition. */
private[plans] object TopKBuffer {
  def topKPerPartition(
      iter: Iterator[InternalRow],
      groupProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int): Iterator[(UnsafeRow, mutable.PriorityQueue[InternalRow])] = {
    // max-heap on the ordering: the root is the WORST retained row, so a
    // better incoming row replaces it in O(log k)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = groupProj(row)
      val heap = heaps.getOrElseUpdate(key.copy(),
        mutable.PriorityQueue.empty[InternalRow](ordering))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ordering.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
    }
    heaps.iterator
  }
}

/** Partial (map-side) top-k: no distribution requirement, emits the
  * locally-surviving rows only. */
case class LocalTopKExec(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val ps = groupExprs
    val os = orderSpec
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(ps, childOutput)
      val ordering = RowOrdering.create(os, childOutput)
      TopKBuffer.topKPerPartition(iter, groupProj, ordering, kk)
        .flatMap(_._2.iterator)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKExec =
    copy(child = newChild)
}

/** Final top-k: requires clustering by the group key (EnsureRequirements
  * inserts the shuffle), recomputes the exact per-group top-k over the
  * merged partials, and appends the row_number attribute. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val ps = groupExprs
    val os = orderSpec
    val childOutput = child.output
    val outAttrs = output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(ps, childOutput)
      val ordering = RowOrdering.create(os, childOutput)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      TopKBuffer.topKPerPartition(iter, groupProj, ordering, kk).flatMap {
        case (_, heap) =>
          val sorted = heap.dequeueAll.reverse // ascending by the ordering
          val joined = new JoinedRow
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            toUnsafe(joined(row, new GenericInternalRow(Array[Any](i + 1))))
          }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
