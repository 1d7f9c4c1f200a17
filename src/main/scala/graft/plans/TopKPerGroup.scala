package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator: keep the top `k` rows per group under `ordering`.
  *
  * Spark's native plan for this shape (`row_number().over(window) <= k`)
  * must SORT every partition fully before the window operator runs. This
  * operator instead keeps one k-bounded binary heap per group — O(n log k)
  * with no sort buffer, no spill pressure, and memory bounded by
  * groups × k × rowsize per partition, which is exactly the property that
  * survives a 100 TB fact table with bounded k.
  *
  * Wiring: [[TopKPerGroup]] (logical, resolved immediately — output =
  * child output) → [[TopKPerGroupStrategy]] (planner rule, injected via
  * [[GraftExtensions]]) → [[TopKPerGroupExec]] (physical: declares
  * `ClusteredDistribution(group)` so Spark inserts the one required
  * hash-exchange and nothing else).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

class TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, ordering, k, child) =>
      TopKPerGroupExec(group, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** One hash-exchange on the group key; complete groups then live in one
    * partition, so per-partition heaps give the exact global answer. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces; build codegen'd projection/ordering
    // per-partition on the executor
    val groupExprsL = groupExprs
    val orderingL = ordering
    val childOutput = child.output
    val kL = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprsL, childOutput)
      val rowOrdering = RowOrdering.create(orderingL, childOutput)
      // per-group k-bounded heap; heap root = currently-worst kept row
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrdering.compare(a, b)
      }
      iter.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kL + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kL) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrdering.compare(row.asInstanceOf[UnsafeRow], heap.peek()) > 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        while (!h.isEmpty) out += h.poll()
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** DataFrame-level entry: top `k` rows per `group`, LARGEST first under
    * `orderCols` (an ascending SortOrder ranks the maximum as top-1 here,
    * because the heap keeps the largest elements; callers express "top by
    * value" directly). Requires [[TopKPerGroupStrategy]] to be injected
    * (GraftExtensions) or falls back to an UnsupportedOperationException at
    * planning. */
  def apply(df: org.apache.spark.sql.DataFrame,
      group: Seq[String],
      order: Seq[String],
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    // self-install on sessions built without the extensions config
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKPerGroupStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new TopKPerGroupStrategy
    val childPlan = org.apache.spark.sql.GraftBridge.logicalPlan(df)
    // resolve against the analyzed child up front: the node enters the plan
    // fully resolved, with no dependence on analyzer passes over custom nodes
    def attr(name: String): Attribute =
      childPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${childPlan.output.map(_.name).mkString(", ")}"))
    val orderE = order.map(n =>
      SortOrder(attr(n), org.apache.spark.sql.catalyst.expressions.Ascending))
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      TopKPerGroup(group.map(attr), orderE, k, childPlan))
  }
}
