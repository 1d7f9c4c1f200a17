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

  test("range serve: all-probes equals brute-force range search; fewer " +
      "probes only lose neighbors, never invent them") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probes = k-clusters searches every partition — exact by construction
    val exact = IvfIndex.searchRange(spark, path, queries,
      minSim = 0.25, probes = 8)
    val truth = Similarity.rangeSearch(corpus, queries, minSim = 0.25)
    assert(pairs(exact) === pairs(truth))
    assert(pairs(exact).nonEmpty)
    val probed = IvfIndex.searchRange(spark, path, queries,
      minSim = 0.25, probes = 2)
    assert(pairs(probed).subsetOf(pairs(exact)))
    assert(probed.filter(col("sim") < 0.25).isEmpty)
  }

  test("the corpus scan is partition-pruned to the probed clusters") {
    val plan = IvfIndex.searchTopK(spark, path, queries, k = 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cluster partition column:\n$plan")
  }

  test("append is idempotent (in-batch dup + replay) and self-compacts " +
      "past the segment threshold without changing served results") {
    val p = java.nio.file.Files.createTempDirectory("ivf-maint").toString
    IvfIndex.build(corpus.filter(col("vec_id") < 300), k = 8, iters = 2, dim = 64, p)
    val batch = corpus.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    val n0 = IvfIndex.corpus(spark, p).count()
    // redelivery folded into ONE batch + a full replay: both must land once
    IvfIndex.append(spark, p, batch.unionByName(batch))
    assert(IvfIndex.corpus(spark, p).count() === n0 + batch.count(),
      "in-batch duplicate ids must land exactly once")
    val segsBeforeReplay =
      graft.sources.SegmentedTable.readManifest(spark, p).segments
    IvfIndex.append(spark, p, batch)
    assert(IvfIndex.corpus(spark, p).count() === n0 + batch.count(),
      "a replayed batch must append nothing")
    assert(graft.sources.SegmentedTable.readManifest(spark, p).segments
        === segsBeforeReplay,
      "a fully-screened replay must publish no segment (an empty segment " +
        "per replay would tick the compaction threshold for nothing)")
    val qs = corpus.filter(col("vec_id") < 4)
    def res() = IvfIndex.searchTopK(spark, p, qs, k = 5, probes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, -x._3, x._2)).toSeq
    def liveSegs() = graft.sources.SegmentedTable.readManifest(spark, p).segments
    def segDirs() = new java.io.File(s"$p/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("seg=")).toSeq
    // accumulate live segments with compaction disabled, then a
    // zero-fresh-row append at maxSegments = 2 (the minimum) must
    // self-compact to ONE live segment without changing served results
    var next = 350L
    while (next < 360) {
      IvfIndex.append(spark, p,
        corpus.filter(col("vec_id") >= next && col("vec_id") < next + 2),
        maxSegments = 1000000)
      next += 2
    }
    assert(liveSegs().length > 2, "fixture failed to fragment the index")
    val beforeCompact = res()
    IvfIndex.append(spark, p, batch, maxSegments = 2) // zero fresh rows
    assert(liveSegs().length === 1,
      "compaction must collapse the live set to one segment")
    // within the compacted segment: one file per cluster partition (the
    // serve-optimal floor)
    val liveDir = new java.io.File(
      graft.sources.SegmentedTable.segDir(s"$p/corpus", liveSegs().head))
    val clusterDirs = liveDir.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("cluster="))
    assert(clusterDirs.nonEmpty, "compacted segment must keep the cluster= layout")
    assert(clusterDirs.forall(d =>
        d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet")) == 1),
      "one file per cluster partition after compaction")
    assert(res() === beforeCompact, "compaction must not change served results")
    // superseded segments are retained for in-flight readers; vacuum
    // (writer-only) reclaims exactly the unreferenced ones
    assert(segDirs().length > 1,
      "superseded segments must be retained until vacuum")
    IvfIndex.vacuum(spark, p)
    assert(segDirs().map(_.drop("seg=".length).toLong).sorted === liveSegs().sorted,
      "vacuum must leave exactly the manifest-named segments")
    assert(res() === beforeCompact, "vacuum must not change served results")
    val plan = IvfIndex.searchTopK(spark, p, qs, k = 5, probes = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "pruning must survive compaction and vacuum")
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

  test("delete hides vectors immediately, re-append restores them, and " +
      "compaction + vacuum physically erase the tombstoned bytes") {
    val p = java.nio.file.Files.createTempDirectory("ivf-delete").toString
    val base = corpus.filter(col("vec_id") < 200)
    IvfIndex.build(base, k = 4, iters = 2, dim = 64, p)
    def servedIds() = IvfIndex.searchTopK(spark, p,
        corpus.filter(col("vec_id") === 0), k = 200, probes = 4)
      .select("neighbor_id").as[Long].collect().toSet
    def liveIds() = IvfIndex.corpus(spark, p)
      .select("vec_id").as[Long].collect().toSet
    assert(liveIds().contains(50L) && liveIds().contains(60L))
    // logical delete: gone from serve and corpus reads at once
    IvfIndex.delete(spark, p, Seq(50L, 60L).toDF("vec_id"))
    assert(!liveIds().contains(50L) && !liveIds().contains(60L))
    assert(!servedIds().contains(50L) && !servedIds().contains(60L))
    // deleting an absent id is a harmless no-op
    IvfIndex.delete(spark, p, Seq(999999L).toDF("vec_id"))
    assert(liveIds().size === 198)
    // a deleted id is RE-insertable: the append screen must not see the
    // tombstone, and the read side must not hide the fresh row
    IvfIndex.append(spark, p,
      corpus.filter(col("vec_id") === 50).select("vec_id", "embedding"))
    assert(liveIds().contains(50L), "re-appended id must be live again")
    assert(!liveIds().contains(60L), "other tombstones survive the rewrite")
    // compaction materializes the filtered view and clears the ledger;
    // after vacuum the deleted id's bytes exist in NO remaining file
    IvfIndex.compact(spark, p)
    IvfIndex.vacuum(spark, p)
    assert(liveIds().contains(50L) && !liveIds().contains(60L))
    val remaining = spark.read.parquet(s"$p/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(!remaining.contains(60L),
      "compaction + vacuum must physically erase the tombstoned row")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deletesDir = new org.apache.hadoop.fs.Path(s"$p/deletes")
    val ledgerSegs =
      if (fs.exists(deletesDir)) fs.listStatus(deletesDir).length else 0
    assert(ledgerSegs === 0, "vacuum must reclaim every superseded ledger segment")
  }
}
