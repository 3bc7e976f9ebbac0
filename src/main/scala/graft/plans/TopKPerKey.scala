package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/**
 * Per-key top-k as a first-class operator — the custom-plan tier
 * (LogicalPlan + Strategy + SparkPlan) of the extension ladder, used
 * where composing built-ins genuinely leaves performance behind: the
 * `row_number().over(window).filter(rn <= k)` formulation must SORT every
 * partition fully (O(n log n)) and materialize the whole window, while
 * per-key bounded heaps do O(n log k) with memory O(distinct keys × k).
 * At 100 TB that is the difference between a spill-prone sort stage and a
 * streaming pass.
 *
 * Semantics: for each distinct key, emit the first k rows of the child in
 * `order` (ties resolved by the order itself — pass a total order for
 * deterministic output, as with row_number). Row order within the result
 * is unspecified, matching relational set semantics.
 */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: inject via GraftExtensions (cluster deploys) or
  * `spark.experimental.extraStrategies` (live sessions — Relational
  * .topKPerKey does this automatically). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // all rows of one key must meet in one partition (same contract as the
  // window formulation); Catalyst inserts the hash exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection: child rows are usually UnsafeRow already
      // (exchange output), but if the ClusteredDistribution is satisfied
      // without an exchange a row-based child may emit generic
      // InternalRows — normalize instead of casting
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap on the row ordering: head = worst retained row
      val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrdering.compare(a, b)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val unsafe = row match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj(unsafe)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(unsafe.copy())
        else if (rowOrdering.compare(unsafe, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(unsafe.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
