package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** IVF-ADC — the two-level ANN index (Jégou et al. 2011; the FAISS
  * `IVFx,PQy` architecture) composed from the engine's pieces: a COARSE
  * k-means quantizer prunes which clusters a query reads
  * ([[IvfIndex]]-style partition layout), and within the probed clusters
  * every vector is scored from its PRODUCT-QUANTIZATION codes
  * ([[ProductQuantizer]] ADC lookups) — the serving table stores ONLY
  * (vec_id, codes) per cluster partition, never the raw vectors. That pair
  * of choices is what makes billion-vector search feasible: partition
  * pruning bounds I/O to probes/k of the corpus, and the PQ codes bound
  * memory to a few bytes per vector.
  *
  * Scale shape at serve time: the probe set and the per-query ADC tables
  * are tiny and broadcast; the only corpus-side work is a scan of the
  * probed cluster directories (dynamic partition pruning, spec-asserted)
  * scoring m table lookups per code row, then the k-bounded-heap top-k.
  */
object IvfAdc {

  /** Train the coarse quantizer + PQ codebooks, write centroids, codebooks,
    * and the per-cluster CODE table (no raw vectors) under `path`. */
  def build(corpus: DataFrame, kCoarse: Int, coarseIters: Int,
      m: Int, kSub: Int, pqIters: Int, dim: Int, path: String): Unit = {
    val centroids = Similarity.kmeansCentroids(corpus, kCoarse, coarseIters, dim)
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val books = ProductQuantizer.train(corpus, m, kSub, pqIters, dim)
    books.write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks")
    Similarity.assignClusters(corpus, centroids)
      .select(col("cluster"), col("vec_id"))
      .join(ProductQuantizer.encode(corpus, books, m, dim), "vec_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(s"$path/codes")
  }

  /** Multi-probe ADC top-k against the persisted index: each query probes
    * its `probes` nearest coarse clusters and scores ONLY those partitions'
    * code rows. Returns (query_id, neighbor_id, adc_dist), dist ASC. */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, dim: Int, k: Int, probes: Int): DataFrame = {
    require(probes >= 1)
    val centroids = spark.read.parquet(s"$path/centroids")
    val books = spark.read.parquet(s"$path/codebooks")
    val codes = spark.read.parquet(s"$path/codes")
    val probed = queries
      .crossJoin(broadcast(Similarity.packedCentroids(centroids)))
      .select(
        explode(Similarity.nearestCentroids(col("embedding"), col("cents"), probes))
          .as("cluster"),
        col("vec_id").as("query_id"))
      .join(ProductQuantizer.adcTables(queries, books, m, dim), "query_id")
    val scored = codes.join(broadcast(probed), "cluster")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ProductQuantizer.adcDistance(col("tables"), col("codes"), m).as("adc_dist"))
    ProductQuantizer.topKByDistAsc(scored, k)
  }
}
