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
  *
  * When NOT to use — BUILD-shaped iterative operators (NnDescent rounds,
  * triangle orientation, k-core peels): constructing those frames IS
  * running the build, and their per-round joins rely on AQE's runtime
  * broadcast decisions. Measured at sf0.1, forcing them lazy cost
  * sim_nndescent +67% and ev_triangles +33% calibration-normalized
  * (sort-merge fallbacks), dwarfing the construction-laziness win. Use
  * this helper for QUERY-shaped operators whose checkpointed fragment has
  * a fixed plan (fan-out projections, token-keyed joins that SMJ under
  * either planner — dd_lsh_pairs −18%, dd_prefix_pairs −45% measured).
  */
object LazyCheckpoint {
  /** The conf flip is session-global, so concurrent `of` calls on one
    * session serialize on the session monitor (concurrent UNRELATED
    * queries on the same session during the window would plan
    * non-adaptively — a documented single-writer-style caveat; the
    * engine's mains and test JVM construct frames sequentially). */
  def of(df: DataFrame): DataFrame = df.sparkSession.synchronized {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try df.localCheckpoint(eager = false)
    finally conf.set(key, prev)
  }
}
