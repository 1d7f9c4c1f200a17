package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.SegmentedTable

/** Persisted IVF index — the build-then-serve form of [[Similarity.ivfTopK]]
  * where the cluster assignment becomes the TABLE LAYOUT. `build` trains
  * the coarse centroids, assigns every vector once, and writes the corpus
  * partitioned by cluster; `searchTopK` then joins the (small, broadcast)
  * probe set against the partitioned table on the partition column, so
  * Spark's dynamic partition pruning turns "search p clusters" into
  * "READ p directories" — at 100 TB the non-probed clusters are never
  * scanned, not merely filtered. Nothing is reassigned at query time; the
  * one-time assignment cost is amortized over every query batch, which is
  * what distinguishes an index from a plan.
  *
  * The layout is also the maintenance story: a new ingest batch assigns
  * against the SAME persisted centroids (row-local) and lands as a new
  * `corpus/seg=<v>/` segment published by an atomic manifest flip — the
  * [[graft.sources.SegmentedTable]] protocol shared by every persisted
  * index here (staging is invisible, a crash leaves an inert orphan, no
  * torn-directory window; see [[IndexIngest]] for the screen/compaction
  * sequence). Periodic re-training is a rebuild, exactly like any
  * inverted index; `meta/` + `commit/` carry the
  * [[graft.sources.BuildStamp]] torn-REBUILD protection (the centroids are
  * only comparable with the corpus assignment they produced, so a rebuild
  * that dies between writing centroids and publishing the reassigned
  * corpus must fail loudly, not serve a mixed generation). */
object IvfIndex {

  /** Train k-means centroids, assign the corpus, write both under `path`
    * (`centroids/` plain, `corpus/seg=0/` partitioned by cluster,
    * manifest + build stamp). */
  def build(corpus: DataFrame, k: Int, iters: Int, dim: Int, path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    Seq(Tuple1(buildId)).toDF("build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    val centroids = Similarity.kmeansCentroids(corpus, k, iters, dim)
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    // version past any directory an earlier generation left behind
    val v =
      if (SegmentedTable.manifestExists(spark, path))
        SegmentedTable.readManifest(spark, path).version + 1
      else 0L
    Similarity.assignClusters(corpus, centroids)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(SegmentedTable.segDir(s"$path/corpus", v))
    SegmentedTable.writeManifest(spark, path,
      SegmentedTable.Manifest(v, Seq(v)))
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  private def requireCommitted(spark: SparkSession, path: String): Unit =
    graft.sources.BuildStamp.requireCommitted(spark, path,
      spark.read.parquet(s"$path/meta").head(), "IVF index")

  /** The live (cluster, vec_id, embedding) corpus rows — one
    * manifest-pinned scan; orphan/superseded segments are invisible. */
  def corpus(spark: SparkSession, path: String): DataFrame = {
    requireCommitted(spark, path)
    IndexIngest.readLive(spark, path, "corpus")
  }

  /** Append new vectors to the index without retraining: assign against
    * the PERSISTED centroids (row-local) and publish as a new corpus
    * segment. Ingest-maintenance semantics (exactly-once id screen with
    * in-batch dedup, INSERT-ONLY — a re-embedded existing id is dropped,
    * not updated; rebuild to refresh — invisible staging + atomic manifest
    * flip, self-compaction past `maxSegments` live segments, single
    * writer) are the shared [[IndexIngest]] sequence — one definition with
    * [[IvfAdc.append]], so the two cannot drift. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      maxSegments: Int = 16): Unit = {
    requireCommitted(spark, path)
    IndexIngest.appendScreened(spark, path, "corpus", batch, "vec_id",
      fresh => Similarity.assignClusters(
        fresh, spark.read.parquet(s"$path/centroids")),
      maxSegments)
  }

  /** Rewrite the live corpus segments into one (one file per cluster) and
    * publish with a manifest flip; see [[IndexIngest.compact]]. */
  def compact(spark: SparkSession, path: String): Unit =
    IndexIngest.compact(spark, path, "corpus")

  /** Logical delete of vectors by id (tombstone ledger; erased physically
    * at the next [[compact]]) — see [[IndexIngest.delete]]. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    requireCommitted(spark, path)
    IndexIngest.delete(spark, path, "corpus", ids, "vec_id")
  }

  /** Reclaim segment dirs the current manifest does not name (corpus AND
    * superseded tombstone-ledger segments). WRITER-ONLY, serialized with
    * append/compact/delete; see [[IndexIngest.vacuum]]. */
  def vacuum(spark: SparkSession, path: String, retainSnapshots: Int = 1): Unit =
    IndexIngest.vacuum(spark, path, "corpus", retainSnapshots)

  /** Multi-probe top-k against the persisted index: identical results to
    * [[Similarity.ivfTopK]] over the same centroids, but the corpus scan is
    * partition-pruned to the probed clusters (static `seg IN` pruning for
    * the live segments composes with dynamic pruning on `cluster`). */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, probes: Int): DataFrame = {
    require(probes >= 1)
    val centroids = spark.read.parquet(s"$path/centroids")
    val corpusLive = corpus(spark, path)
      .select(col("cluster"), col("vec_id").as("neighbor_id"),
        col("embedding").as("n_vec"))
    val queriesC = queries
      .crossJoin(broadcast(Similarity.packedCentroids(centroids)))
      .select(
        explode(Similarity.nearestCentroids(col("embedding"), col("cents"), probes))
          .as("cluster"),
        col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val joined = queriesC.join(corpusLive, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
    Similarity.topKBySim(joined, k)
  }

  /** Radius (threshold) search against the persisted index — the
    * [[Similarity.rangeSearch]] semantics served from the stored cluster
    * layout: every indexed neighbor at cosine ≥ `minSim` among the
    * `probes` nearest clusters of each query. Same probed, partition-
    * pruned scan as [[searchTopK]] with the heap replaced by a row-local
    * threshold predicate — no window, no heap, output bounded by the
    * threshold. As with any IVF serve, recall < 1 when a true neighbor
    * lives outside the probed clusters; probes = k-clusters is exact. */
  def searchRange(spark: SparkSession, path: String, queries: DataFrame,
      minSim: Double, probes: Int): DataFrame = {
    require(probes >= 1)
    val centroids = spark.read.parquet(s"$path/centroids")
    val corpusLive = corpus(spark, path)
      .select(col("cluster"), col("vec_id").as("neighbor_id"),
        col("embedding").as("n_vec"))
    val queriesC = queries
      .crossJoin(broadcast(Similarity.packedCentroids(centroids)))
      .select(
        explode(Similarity.nearestCentroids(col("embedding"), col("cents"), probes))
          .as("cluster"),
        col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    queriesC.join(corpusLive, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
