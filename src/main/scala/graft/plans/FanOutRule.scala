package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, Repartition}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

import graft.expressions.{CosineSimilarity, MinHashSignature}

/** Optimizer rule: fan out scans that feed CPU-expensive projections.
  *
  * A parquet scan parallelizes by file/row-group, so a small-file (or
  * selective, coalesced) scan can leave heavy per-row compute — MinHash
  * signatures, cosine loops — running on a handful of tasks regardless of
  * cluster width. This rule inserts a round-robin `Repartition` to shuffle
  * width between a leaf scan and any `Project` containing one of the
  * engine's expensive expressions: a few MB of extra shuffle buying
  * full-width execution (the declarative form of
  * [[graft.operators.Parallelism.fanOut]]).
  *
  * Installed via [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`. Idempotent: it never fires when
  * the child is already a repartition. At real cluster scale a
  * many-row-group scan already yields wide parallelism and the fan-out is
  * harmlessly cheap relative to the projection it protects.
  */
object FanOutExpensiveProjections extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: MinHashSignature | _: CosineSimilarity => true
    case _ => false
  }

  /** A scan, possibly under pushable filters — the shapes whose output
    * parallelism is bounded by file splits (and further narrowed by
    * selective filters), not by the cluster. */
  private def isNarrowScan(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case Filter(_, child) => isNarrowScan(child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(exprs, child) if exprs.exists(isExpensive) && isNarrowScan(child) =>
      // repartition above the filter chain: the shuffle moves only the
      // filter's survivors, and the expensive projection runs at width
      p.copy(child = Repartition(SQLConf.get.numShufflePartitions,
        shuffle = true, child))
  }
}
