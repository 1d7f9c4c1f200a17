package graft.plans

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The three contracts of [[LazyCheckpoint]]: (1) construction runs zero
  * jobs even when the fragment contains shuffles; (2) the result is
  * bound to the CALLER's session and value-identical to the fragment;
  * (3) — the round-13 de-risk — the caller session's AQE conf is never
  * flipped, so concurrent unrelated constructions plan adaptively even
  * while a checkpoint is being planned (the round-12 session-global flip
  * made them non-adaptive during the window). */
class LazyCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def fragment() =
    spark.range(0, 1000)
      .select((col("id") % 7).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s")) // a real exchange in the fragment

  test("construction of a shuffle-bearing fragment runs ZERO jobs") {
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val ck = LazyCheckpoint.of(fragment())
      ck.queryExecution.executedPlan // force planning
      Thread.sleep(300)
      assert(jobs.get() === 0,
        s"lazy checkpoint construction ran ${jobs.get()} jobs")
      // and the frame still computes the right thing when acted on
      assert(ck.agg(sum("s")).as[Long].head() ===
        (0L until 1000L).sum)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("result is caller-session-bound and composes with caller frames") {
    val ck = LazyCheckpoint.of(fragment())
    assert(ck.sparkSession eq spark,
      "checkpointed frame must belong to the calling session")
    val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "name")
    val joined = ck.join(dim, "k").orderBy("k")
      .select("k", "name", "s").collect()
    assert(joined.length === 2 && joined.head.getString(1) === "a")
  }

  test("value-identical to the un-checkpointed fragment") {
    assert(rowSet(LazyCheckpoint.of(fragment())) === rowSet(fragment()))
  }

  test("caller AQE conf never flips; concurrent constructions stay adaptive") {
    val key = "spark.sql.adaptive.enabled"
    assert(spark.conf.get(key) === "true", "precondition: AQE on")
    @volatile var sawFlip = false
    @volatile var sawNonAdaptive = false
    @volatile var stop = false
    // racing thread: constructs unrelated aggregates in a loop, checking
    // both the session conf and the planned shape every iteration
    val racer = new Thread(() => {
      while (!stop) {
        if (spark.conf.get(key) != "true") sawFlip = true
        val p = spark.range(0, 100)
          .groupBy((col("id") % 3).as("g")).count()
          .queryExecution.executedPlan
        if (!p.isInstanceOf[AdaptiveSparkPlanExec]) sawNonAdaptive = true
      }
    })
    racer.start()
    try {
      (1 to 20).foreach { _ =>
        LazyCheckpoint.of(fragment()).queryExecution.executedPlan
      }
    } finally { stop = true; racer.join(10000) }
    assert(!sawFlip, "caller session AQE conf was flipped during of()")
    assert(!sawNonAdaptive,
      "a concurrent unrelated construction planned non-adaptively")
  }

  test("checkpointed fragment itself plans non-adaptively (the AQE-off scope)") {
    val ck = LazyCheckpoint.of(fragment())
    // the transplanted leaf is a checkpointed RDD scan, not an adaptive
    // re-planner: its physical plan must contain no AdaptiveSparkPlan
    val leaf = ck.queryExecution.analyzed
    assert(leaf.toString.contains("LogicalRDD") ||
      leaf.collectLeaves().mkString.contains("LogicalRDD"),
      s"expected a LogicalRDD leaf, got:\n$leaf")
  }

  test("temp views are cleaned up, even across many calls") {
    (1 to 3).foreach(_ => LazyCheckpoint.of(fragment()))
    val leftovers = spark.catalog.listTables("global_temp").collect()
      .map(_.name).filter(_.startsWith("graft_lc_"))
    assert(leftovers.isEmpty, s"leaked views: ${leftovers.mkString(",")}")
  }

  test("caller runtime conf reaches the fragment's planning") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "3")
      val ck = LazyCheckpoint.of(fragment())
      assert(ck.rdd.getNumPartitions === 3,
        "fragment must plan with the caller's runtime shuffle partitions")
    } finally spark.conf.set(key, prev)
  }

  test("a conf UNSET on the caller is unset on the planner too (no stale pin)") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "3")
      assert(LazyCheckpoint.of(fragment()).rdd.getNumPartitions === 3)
      // unset falls back to the context-level SparkConf value; a set-only
      // sync would leave the planner pinned at the stale session value 3
      spark.conf.unset(key)
      val fallback = spark.conf.get(key).toInt
      assert(fallback !== 3, "test needs a fallback that differs from 3")
      assert(LazyCheckpoint.of(fragment()).rdd.getNumPartitions === fallback,
        "planner kept a stale session conf after the caller unset it")
    } finally spark.conf.set(key, prev)
  }
}
