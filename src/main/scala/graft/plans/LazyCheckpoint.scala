package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * HOW the AQE-off scope is obtained (round 13 — replaces the round-12
  * session-global conf flip, which made concurrent unrelated
  * constructions on the same session plan non-adaptively during the
  * window): the fragment is re-planned under a dedicated SIBLING session
  * (`SparkSession.newSession()` — same `SparkContext`, same shared state,
  * its own `SQLConf`) whose runtime conf is refreshed from the caller's
  * session on every call and then pinned to `spark.sql.adaptive.enabled
  * = false`. The caller's conf is NEVER touched, so any concurrent
  * construction on the caller's session keeps AQE at all times. The
  * analyzed fragment crosses sessions through a uniquely-named GLOBAL
  * temp view (the one catalog namespace `newSession` shares — public API,
  * no private[sql] constructors), and the checkpointed result (a
  * `LogicalRDD` leaf over the shared context) is transplanted back the
  * same way, so the frame the caller receives is bound to the CALLER's
  * session and composes with its other frames. Both views are dropped
  * before returning; names carry a UUID so concurrent calls never
  * collide.
  *
  * Contract: pass a frame whose physical plan has not been forced yet
  * (construct, then checkpoint immediately); `executedPlan` is a lazy val,
  * so a frame that was already executed adaptively would ignore the scoped
  * conf. A statically-planned BROADCAST subtree inside the fragment still
  * submits its collect job at RDD-construction time even with AQE off —
  * use merge-join hints inside checkpointed fragments (their frames are
  * bounded by construction).
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

  /** One planner session per caller session, created lazily and held
    * weakly (a dropped caller session must not be pinned by its planner).
    * The planner's runtime conf is SYNCED from the caller on every `of`
    * call — session-conf changes made after the first call still reach
    * the fragment's planning — but the sync is EPOCH-CACHED: the caller's
    * `getAll` snapshot is compared to the last-synced snapshot and the
    * per-key `set` loop (hundreds of validated SQLConf writes) runs only
    * when something actually changed. Keys the caller UNSET since the
    * last sync are unset on the planner too (`getAll` returns only
    * explicitly-set keys, so a set-only copy would pin stale values —
    * e.g. a reverted shuffle.partitions override). Static confs that
    * refuse `set` are skipped (they were fixed at context construction
    * and are shared anyway). Measured at sf0.1 the full re-copy was
    * ~10-20ms per call, paid on every construction of every
    * checkpoint-bearing operator — the r13 dd_lsh_pairs drift suspect. */
  private final class Planner(val session: SparkSession) {
    var lastConf: Map[String, String] = null
  }
  private val planners =
    new java.util.WeakHashMap[SparkSession, Planner]()

  private def plannerFor(s: SparkSession): Planner =
    planners.synchronized {
      var p = planners.get(s)
      if (p == null) { p = new Planner(s.newSession()); planners.put(s, p) }
      p
    }

  def of(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val p = plannerFor(s)
    val planner = p.session
    // serialize on the PLANNER (not the caller session): concurrent `of`
    // calls queue here, while unrelated constructions on the caller's
    // session proceed adaptively in parallel — the round-12 caveat gone.
    planner.synchronized {
      val callerConf = s.conf.getAll
      if (p.lastConf != callerConf) {
        if (p.lastConf != null)
          (p.lastConf.keySet -- callerConf.keySet).foreach { k =>
            try planner.conf.unset(k)
            catch { case _: org.apache.spark.sql.AnalysisException => () }
          }
        callerConf.foreach { case (k, v) =>
          if (p.lastConf == null || !p.lastConf.get(k).contains(v))
            try planner.conf.set(k, v)
            catch { case _: org.apache.spark.sql.AnalysisException => () }
        }
        p.lastConf = callerConf
        // the two pins are re-asserted only after a sync touched the conf;
        // they are not in lastConf (planner-only keys), so the stale-key
        // unset above can never drop them
        planner.conf.set("spark.sql.adaptive.enabled", "false")
        // no STATICALLY-planned broadcasts inside checkpointed fragments:
        // BroadcastExchangeExec.doPrepare submits its collect job at
        // RDD-construction time even with AQE off, so an auto-broadcast
        // here is a construction-time job (and, when the "small" side is a
        // checkpoint-preserved stat of a corpus-derived frame, a driver
        // collect of corpus-sized data — dd_prefix_pairs measured the
        // static planner broadcasting the exploded-corpus side at sf0.1).
        // Explicit broadcast() hints on the caller's side still win; the
        // fragments routed through here are aggregates and token-keyed
        // joins that SMJ at scale anyway.
        planner.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      }
      val id = java.util.UUID.randomUUID().toString.replace("-", "")
      val inName = s"graft_lc_in_$id"
      df.createOrReplaceGlobalTempView(inName)
      try {
        val ck = planner.table(s"global_temp.$inName")
          .localCheckpoint(eager = false)
        val outName = s"graft_lc_out_$id"
        ck.createOrReplaceGlobalTempView(outName)
        // s.table analyzes EAGERLY (the view's plan — the LogicalRDD leaf —
        // is inlined at Dataset construction), so dropping the view before
        // returning leaves the frame intact
        try s.table(s"global_temp.$outName")
        finally s.catalog.dropGlobalTempView(outName)
      } finally s.catalog.dropGlobalTempView(inName)
    }
  }
}
