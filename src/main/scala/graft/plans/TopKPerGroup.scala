package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, Literal, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, UnresolvedHint}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole-operator Catalyst extension stack (SURVEY §7.3's level
  * (c), beside the level-(b) native expressions `graft_dot*`):
  * grouped top-k as a FIRST-CLASS physical operator instead of the
  * `Window row_number ≤ k` formulation.
  *
  * Why a dedicated operator: the Window plan SORTS every group in
  * full — O(n log n) per group and the whole input spills through the
  * sort — to keep k rows. [[TopKPerGroupExec]] keeps one bounded
  * k-heap per group in a single pass over each (hash-clustered)
  * partition: O(n log k), no sort, no spill beyond k rows per group.
  * At 100 TB with k = 10 and millions of groups, that is the
  * difference between sorting the corpus and streaming it.
  *
  * Wiring (all public API, the way a library ships it):
  *  - the USER-FACING surface is a hint — `df.hint("GRAFT_TOPK", k,
  *    group, order, tie)` ([[graft.operators.Relational.topKPerGroup]]
  *    wraps it);
  *  - [[ResolveTopKHint]] (injected via
  *    `SparkSessionExtensions.injectResolutionRule`) rewrites the
  *    resolved hint into the custom logical node [[TopKPerGroupNode]]
  *    — Spark's own Hints batch only touches its join/coalesce names
  *    and leaves foreign hints for the resolution batch;
  *  - [[TopKPerGroupStrategy]] (via `injectPlannerStrategy`) plans it
  *    as [[TopKPerGroupExec]], whose `requiredChildDistribution`
  *    makes EnsureRequirements insert exactly one hash exchange on
  *    the group key.
  *
  * Determinism contract: (order DESC, tie ASC) must be a TOTAL order
  * per group (the gate uses a unique tie column), so the kept row SET
  * is partition- and rerun-invariant even though heap emission order
  * is not ordered — consumers sort, as with any Spark operator.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override lazy val resolved: Boolean =
    child.resolved && groupExprs.forall(_.resolved) && order.forall(_.resolved)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Rewrites `UnresolvedHint("GRAFT_TOPK", Seq(k, group, order, tie))`
  * into [[TopKPerGroupNode]] once the child is resolved. Unknown
  * params throw analysis-time (never silently drop to a wrong plan).
  */
case class ResolveTopKHint(spark: SparkSession) extends Rule[LogicalPlan] {
  private def attr(child: LogicalPlan, name: String): Attribute =
    child.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"GRAFT_TOPK: column '$name' not in ${child.output.map(_.name).mkString(", ")}"))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("GRAFT_TOPK") && child.resolved =>
      // Dataset.hint wraps scalar parameters as Literals.
      params match {
        case Seq(
              Literal(k: Int, IntegerType),
              Literal(g: UTF8String, StringType),
              Literal(o: UTF8String, StringType),
              Literal(t: UTF8String, StringType)) =>
          TopKPerGroupNode(
            Seq(attr(child, g.toString)),
            Seq(
              SortOrder(attr(child, o.toString), Descending),
              SortOrder(attr(child, t.toString), Ascending)),
            k,
            child)
        case other =>
          throw new IllegalArgumentException(
            s"GRAFT_TOPK expects (k: Int, group, orderDesc, tieAsc) — got $other")
      }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One pass, one bounded k-heap per group key, per hash-clustered
  * partition. The heap is a MIN-heap under the requested (desc, tie)
  * order reversed, so its head is the weakest kept row and each
  * candidate costs one comparison when the heap is full.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val g = groupExprs
    val ord = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val better = GenerateOrdering.generate(ord, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // PriorityQueue head = LARGEST under `better` = the weakest kept
      val weakestFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = better.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kk + 1, weakestFirst)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < kk) pq.add(row.copy())
        else if (better.compare(row, pq.peek()) < 0) {
          pq.poll()
          pq.add(row.copy())
        }
      }
      val out = Vector.newBuilder[InternalRow]
      heaps.values().forEach(pq => pq.forEach(r => out += r))
      out.result().iterator
    }, preservesPartitioning = true)
  }
}
