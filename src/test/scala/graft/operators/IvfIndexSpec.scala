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

  test("append is idempotent (in-batch dup + replay) and self-compacts " +
      "past the per-partition threshold without changing served results") {
    val p = java.nio.file.Files.createTempDirectory("ivf-maint").toString
    IvfIndex.build(corpus.filter(col("vec_id") < 300), k = 8, iters = 2, dim = 64, p)
    val batch = corpus.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    val n0 = spark.read.parquet(s"$p/corpus").count()
    // redelivery folded into ONE batch + a full replay: both must land once
    IvfIndex.append(spark, p, batch.unionByName(batch))
    assert(spark.read.parquet(s"$p/corpus").count() === n0 + batch.count(),
      "in-batch duplicate ids must land exactly once")
    IvfIndex.append(spark, p, batch)
    assert(spark.read.parquet(s"$p/corpus").count() === n0 + batch.count(),
      "a replayed batch must append nothing")
    val qs = corpus.filter(col("vec_id") < 4)
    def res() = IvfIndex.searchTopK(spark, p, qs, k = 5, probes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, -x._3, x._2)).toSeq
    val dir = new org.apache.hadoop.fs.Path(s"$p/corpus")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countFiles() = {
      val it = fs.listFiles(dir, true); var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    def nParts() = fs.listStatus(dir).count(_.isDirectory)
    // fragment past the ratio-2 threshold with compaction disabled, then a
    // zero-fresh-row append at ratio 2 (the minimum) must self-compact to
    // one file per partition without changing served results
    var next = 350L
    while (countFiles() <= 2 * nParts() && next < 450) {
      IvfIndex.append(spark, p,
        corpus.filter(col("vec_id") >= next && col("vec_id") < next + 2),
        maxFilesPerPartition = 1000000)
      next += 2
    }
    assert(countFiles() > 2 * nParts(), "fixture failed to fragment the index")
    val beforeCompact = res()
    IvfIndex.append(spark, p, batch, maxFilesPerPartition = 2) // zero fresh rows
    assert(countFiles() === nParts(),
      "compaction must leave one file per cluster partition")
    assert(res() === beforeCompact, "compaction must not change served results")
    val plan = IvfIndex.searchTopK(spark, p, qs, k = 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), "pruning must survive compaction")
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
