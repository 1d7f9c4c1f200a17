package graft

/** Plan-shape regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, true top-k) are asserted against the
  * executed plan so a future refactor can't silently lose them.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val df = Registry.byName(name).fn(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q01: null filter reaches the parquet scan, single-column read") {
    val p = planOf("q01_null_filter")
    assert(p.contains("PushedFilters: [IsNotNull(c_name)]"), p)
    assert(p.contains("ReadSchema: struct<c_name:string>"), p)
  }

  test("q03: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: the aggregate side broadcasts; the fact side never shuffles") {
    val p = planOf("q05_greatest_per_group")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j2: dimension joins are broadcast with pruned scans") {
    val p = planOf("j2_fk_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double>"), p)
  }

  test("rj: range join broadcasts the band table (BroadcastNestedLoopJoin)") {
    val p = planOf("rj_range_join")
    assert(p.contains("BroadcastNestedLoop"), p)
  }
}
