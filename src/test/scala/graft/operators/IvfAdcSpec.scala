package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfAdcSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val corpus = graft.sources.Tables(spark, sf, "embeddings")
    .select("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 4)

  private val (kCoarse, m, kSub, dim) = (8, 8, 16, 64)

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("ivfadc").toString
    IvfAdc.build(corpus, kCoarse, coarseIters = 2, m, kSub, pqIters = 2, dim, p)
    p
  }

  test("probing ALL clusters equals the flat ADC scan over the same codebooks") {
    val books = spark.read.parquet(s"$path/codebooks")
    val flat = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(corpus, books, m, dim), queries, books, m, dim, k = 5)
    val ivf = IvfAdc.searchTopK(spark, path, queries, m, dim, k = 5, probes = kCoarse)
    assert(rowSet(ivf) === rowSet(flat))
    assert(ivf.count() === 4 * 5)
  }

  test("single-probe recall is a subset of all-probe; both rank by ADC distance") {
    val all = IvfAdc.searchTopK(spark, path, queries, m, dim, k = 5, probes = kCoarse)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = IvfAdc.searchTopK(spark, path, queries, m, dim, k = 5, probes = 1)
    // every single-probe hit whose neighbor ALSO lives in the probed cluster
    // set of the full search must appear there with equal-or-better rank;
    // weaker but robust: single-probe returns <= k rows per query and only
    // real corpus ids
    val oneRows = one.collect()
    assert(oneRows.length <= 4 * 5 && oneRows.nonEmpty)
    assert(oneRows.map(_.getLong(1)).toSet.subsetOf(
      corpus.select("vec_id").as[Long].collect().toSet))
    // recall against all-probe is non-trivial on this fixture
    val oneSet = oneRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneSet.intersect(all).nonEmpty)
  }

  test("the code scan is partition-pruned to the probed clusters; no raw vectors stored") {
    val plan = IvfAdc.searchTopK(spark, path, queries, m, dim, k = 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cluster column:\n$plan")
    val codeSchema = spark.read.parquet(s"$path/codes").schema.fieldNames.toSet
    assert(codeSchema === Set("vec_id", "codes", "cluster"),
      s"serving table must hold only ids + codes, got $codeSchema")
  }
}
