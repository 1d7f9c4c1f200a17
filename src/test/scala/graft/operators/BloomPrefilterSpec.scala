package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom prefilter correctness: exactness at any fpp (no false negatives ⇒
  * refine recovers the precise semi-join), genuine pruning at sane fpp, and
  * the prefilter predicate present scan-side in the plan. */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1 to 10000).map(i => (i.toLong, s"k${i % 997}"))
    .toDF("row_id", "key").repartition(5)
  private lazy val keys = (0 until 997 by 13).map(i => s"k$i").toDF("fkey")

  private def exactSemi = big.join(keys, big("key") === keys("fkey"), "left_semi")

  test("bloom semi-join equals the plain semi-join at 1% fpp") {
    val got = BloomPrefilter.semiJoin(big, "key", keys, "fkey", 1000L, 0.01)
    assert(rowSet(got) === rowSet(exactSemi))
  }

  test("bloom semi-join stays exact even at an absurd 50% fpp (refine eats the FPs)") {
    val got = BloomPrefilter.semiJoin(big, "key", keys, "fkey", 1000L, 0.5)
    assert(rowSet(got) === rowSet(exactSemi))
  }

  test("prefilter actually prunes: survivors are far fewer than the corpus, superset of matches") {
    val pref = big.filter(
      BloomPrefilter.mightContain(keys, "fkey", big("key"), 1000L, 0.01))
    val nPref = pref.count()
    val nExact = exactSemi.count()
    assert(nPref >= nExact, "a bloom filter must never drop a true match")
    // 77/997 key groups match (~8%); 1% fpp keeps survivors well under 20%
    assert(nPref < big.count() / 5, s"prefilter pruned nothing: $nPref rows pass")
  }

  test("Spark's automatic runtime filter plants the same predicate on selective shuffle joins") {
    // the optimizer-injected counterpart of BloomPrefilter: when a shuffle
    // join's build side carries a selective filter, InjectRuntimeFilter
    // plants a bloom/semi filter on the probe side by itself — asserting it
    // here pins that the conf path stays live for plans we DON'T hand-tune
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // file-backed scans: the rule targets scannable relations, and the
      // probe-side scan is what the injected filter prunes
      val dir = java.nio.file.Files.createTempDirectory("rtfilter").toString
      big.write.parquet(s"$dir/big")
      keys.write.parquet(s"$dir/keys")
      val probe = spark.read.parquet(s"$dir/big")
      val build = spark.read.parquet(s"$dir/keys").filter(col("fkey") > "k4")
      val plan = probe.join(build, probe("key") === build("fkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloomFilter"),
        s"expected an injected runtime filter on the probe side:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the might_contain predicate sits scan-side, before any join") {
    val plan = BloomPrefilter.semiJoin(big, "key", keys, "fkey", 1000L, 0.01)
      .queryExecution.executedPlan.toString
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(filterIdx >= 0, s"no might_contain in plan:\n$plan")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "might_contain must be UNDER the join (later in the printed tree)")
  }
}
