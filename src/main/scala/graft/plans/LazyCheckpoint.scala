package graft.plans

import org.apache.spark.sql.DataFrame

/** `localCheckpoint(eager = false)` WITHOUT the hidden construction-time
  * job.
  *
  * Under AQE, `Dataset.checkpoint` calls `queryExecution.toRdd`, and an
  * `AdaptiveSparkPlanExec`'s `execute()` materializes every exchange in the
  * fragment as REAL Spark jobs before returning the RDD — so "lazy"
  * checkpointing a fragment that contains a shuffle (a fan-out repartition,
  * an iterative round) executes that shuffle at DataFrame CONSTRUCTION
  * time. Plan-only consumers (explain, plan fingerprints, registry
  * enumeration) silently run corpus-sized jobs; at 100 TB that is a scan
  * per `.explain`. (Verified empirically: constructing the MinHash
  * signature checkpoint ran exactly one job per construction — the
  * repartition's map stage.)
  *
  * Fix: plan the checkpointed fragment with AQE OFF — a non-adaptive
  * `execute()` builds the `ShuffledRowRDD` chain lazily and nothing runs
  * until a real action. The trade is explicit and local: the fragment
  * itself loses AQE's runtime re-planning (partition coalescing, dynamic
  * broadcast, skew splits) while everything downstream of the checkpoint
  * keeps it. Use this for fragments whose plan is already the plan you
  * want — deterministic-width fan-out projections, bounded iterative
  * rounds — not for fragments with size-surprising joins.
  *
  * Contract: pass a frame whose physical plan has not been forced yet
  * (construct, then checkpoint immediately); `executedPlan` is a lazy val,
  * so a frame that was already executed adaptively would ignore the scoped
  * conf.
  */
object LazyCheckpoint {
  def of(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try df.localCheckpoint(eager = false)
    finally conf.set(key, prev)
  }
}
