package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val corpus = graft.sources.Tables(spark, sf, "embeddings")
    .select("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 4)

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("ivf-index").toString
    IvfIndex.build(corpus, k = 8, iters = 2, dim = 64, p)
    p
  }

  test("serving from the persisted index equals ivfTopK over the same centroids") {
    val centroids = spark.read.parquet(s"$path/centroids")
    val direct = Similarity.ivfTopK(corpus, queries, centroids, k = 5, probes = 2)
    val served = IvfIndex.searchTopK(spark, path, queries, k = 5, probes = 2)
    assert(rowSet(served) === rowSet(direct))
    assert(served.count() > 0)
  }

  test("the corpus scan is partition-pruned to the probed clusters") {
    val plan = IvfIndex.searchTopK(spark, path, queries, k = 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cluster partition column:\n$plan")
  }

  test("append makes new vectors searchable without retraining") {
    // clone vector 7 under a fresh id: it must become its own top neighbor
    val clone = corpus.filter(col("vec_id") === 7)
      .select(lit(100007L).as("vec_id"), col("embedding"))
    IvfIndex.append(spark, path, clone)
    val got = IvfIndex.searchTopK(spark, path,
        corpus.filter(col("vec_id") === 7), k = 1, probes = 1)
      .collect()
    assert(got.length === 1 && got.head.getLong(1) === 100007L,
      s"the appended exact clone must be the top-1 neighbor, got ${got.toSeq}")
  }
}
