package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted IVF index — the build-then-serve form of [[Similarity.ivfTopK]]
  * where the cluster assignment becomes the TABLE LAYOUT. `build` trains
  * the coarse centroids, assigns every vector once, and writes the corpus
  * `partitionBy("cluster")`; `searchTopK` then joins the (small, broadcast)
  * probe set against the partitioned table on the partition column, so
  * Spark's dynamic partition pruning turns "search p clusters" into
  * "READ p directories" — at 100 TB the non-probed clusters are never
  * scanned, not merely filtered. Nothing is reassigned at query time; the
  * one-time assignment cost is amortized over every query batch, which is
  * what distinguishes an index from a plan.
  *
  * The layout is also the maintenance story: a new ingest batch assigns
  * against the SAME persisted centroids (row-local) and appends to its
  * cluster partitions; periodic re-training is a rebuild, exactly like any
  * inverted index.
  */
object IvfIndex {

  /** Train k-means centroids, assign the corpus, write both under `path`
    * (`centroids/` plain, `corpus/` partitioned by cluster). */
  def build(corpus: DataFrame, k: Int, iters: Int, dim: Int, path: String): Unit = {
    val centroids = Similarity.kmeansCentroids(corpus, k, iters, dim)
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    Similarity.assignClusters(corpus, centroids)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(s"$path/corpus")
  }

  /** Append new vectors to the index without retraining: assign against
    * the PERSISTED centroids (row-local) and append to the cluster
    * partitions. Ingest-maintenance semantics (exactly-once id screen with
    * in-batch dedup, INSERT-ONLY — a re-embedded existing id is dropped,
    * not updated; rebuild to refresh — self-compaction past
    * `maxFilesPerPartition × clusters` fragments, mid-swap crash healing,
    * single writer) are the shared [[IndexIngest]] sequence — one
    * definition with [[IvfAdc.append]], so the two cannot drift. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      maxFilesPerPartition: Int = 16): Unit =
    IndexIngest.appendScreened(spark, s"$path/corpus", batch, "vec_id",
      fresh => Similarity.assignClusters(
        fresh, spark.read.parquet(s"$path/centroids")),
      maxFilesPerPartition)

  /** Multi-probe top-k against the persisted index: identical results to
    * [[Similarity.ivfTopK]] over the same centroids, but the corpus scan is
    * partition-pruned to the probed clusters. */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, probes: Int): DataFrame = {
    require(probes >= 1)
    val centroids = spark.read.parquet(s"$path/centroids")
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("cluster"), col("vec_id").as("neighbor_id"),
        col("embedding").as("n_vec"))
    val queriesC = queries
      .crossJoin(broadcast(Similarity.packedCentroids(centroids)))
      .select(
        explode(Similarity.nearestCentroids(col("embedding"), col("cents"), probes))
          .as("cluster"),
        col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val joined = queriesC.join(corpus, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
    Similarity.topKBySim(joined, k)
  }
}
