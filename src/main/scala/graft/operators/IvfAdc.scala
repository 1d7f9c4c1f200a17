package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

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
  * RESIDUAL encoding (the production IVFPQ form): the PQ codebooks are
  * trained on, and each vector is encoded as, its residual
  * `vec − coarseCentroid(cluster)` — not the raw vector. Residuals of all
  * clusters concentrate around the origin, so one shared m×k codebook set
  * spends its entire quantization budget on the WITHIN-cluster geometry
  * instead of re-describing the coarse structure the IVF level already
  * captured; recall at fixed bytes/vector is measurably higher (spec:
  * recall@10 residual ≥ raw on the sf0.001 fixture). At serve time each
  * query builds ONE ADC table per probed cluster from its own residual
  * `query − coarseCentroid(cluster)`, so
  * `adc_dist = ||(q − c) − decode(codes)||² = ||q − (c + decode(codes))||²`
  * — the asymmetric distance to the reconstructed vector.
  *
  * Scale shape at serve time: the probe set and the per-(query, cluster)
  * ADC tables are tiny (probes × m × k doubles per query) and broadcast;
  * the only corpus-side work is a scan of the probed cluster directories
  * (dynamic partition pruning, spec-asserted) scoring m table lookups per
  * code row, then the k-bounded-heap top-k.
  */
object IvfAdc {

  /** `a − b` element-wise in doubles — the residual expression. */
  private def residual(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))

  /** Coarse-centroid lookup side: (cluster, __cvec). */
  private def coarseCents(centroids: DataFrame): DataFrame =
    centroids.select(col("vec_id").cast("long").as("cluster"),
      col("embedding").as("__cvec"))

  /** The batch reshaped to residual space: assign against `centroids`, then
    * (cluster, vec_id, embedding = vec − coarseCentroid). One row-local
    * pass (assignment argmax + broadcast centroid join + subtraction),
    * checkpointed because every caller consumes it twice. Shared by `build`
    * and `append` so their encodings cannot drift. */
  private def residualsOf(batch: DataFrame, centroids: DataFrame): DataFrame =
    Similarity.assignClusters(batch, centroids)
      .join(broadcast(coarseCents(centroids)), "cluster")
      .select(col("cluster"), col("vec_id"),
        residual(col("embedding"), col("__cvec")).as("embedding"))
      .localCheckpoint(eager = false)

  /** (cluster, vec_id, codes) for a residual frame under `books`. */
  private def encodeResiduals(residuals: DataFrame, books: DataFrame,
      m: Int, dim: Int): DataFrame =
    residuals.select("cluster", "vec_id")
      .join(ProductQuantizer.encode(
        residuals.select("vec_id", "embedding"), books, m, dim), "vec_id")

  /** Train the coarse quantizer + residual PQ codebooks, write centroids,
    * codebooks, and the per-cluster CODE table (no raw vectors) under
    * `path` (`codes/seg=0/` + manifest — the
    * [[graft.sources.SegmentedTable]] protocol). The PQ parameters (m,
    * dim) are pinned in a one-row `meta/` table: codes are only comparable
    * when encoded under identical parameters, so `append` takes no m/dim
    * (it reads the stored authority) and `searchTopK` fails loudly when a
    * caller's parameters drift from the index's — the same
    * parameter-authority contract as [[BandIndex]], including its
    * torn-rebuild protection: `meta/` (params + a fresh build_id) is
    * written BEFORE the artifacts and a `commit/` marker (the same
    * build_id) AFTER them, so a rebuild that crashes between the two
    * leaves the ids disagreeing and every later meta read fails loudly
    * instead of endorsing new parameters over old artifacts (or vice
    * versa). */
  def build(corpus: DataFrame, kCoarse: Int, coarseIters: Int,
      m: Int, kSub: Int, pqIters: Int, dim: Int, path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    Seq((m, dim, buildId)).toDF("m", "dim", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    val centroids = Similarity.kmeansCentroids(corpus, kCoarse, coarseIters, dim)
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val residuals = residualsOf(corpus, centroids)
    val books = ProductQuantizer.train(
      residuals.select("vec_id", "embedding"), m, kSub, pqIters, dim)
    books.write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks")
    // version past any directory an earlier generation left behind
    val v =
      if (graft.sources.SegmentedTable.manifestExists(spark, path))
        graft.sources.SegmentedTable.readManifest(spark, path).version + 1
      else 0L
    encodeResiduals(residuals, books, m, dim)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(graft.sources.SegmentedTable.segDir(s"$path/codes", v))
    graft.sources.SegmentedTable.writeManifest(spark, path,
      graft.sources.SegmentedTable.Manifest(v, Seq(v)))
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  /** The live (cluster, vec_id, codes) serving rows — one manifest-pinned
    * scan; orphan/superseded segments are invisible. */
  def codes(spark: SparkSession, path: String): DataFrame = {
    meta(spark, path)
    IndexIngest.readLive(spark, path, "codes")
  }

  /** Rewrite the live code segments into one (one file per cluster) and
    * publish with a manifest flip; see [[IndexIngest.compact]]. */
  def compact(spark: SparkSession, path: String): Unit =
    IndexIngest.compact(spark, path, "codes")

  /** Logical delete of vectors by id (tombstone ledger; erased physically
    * at the next [[compact]]) — see [[IndexIngest.delete]]. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    meta(spark, path)
    IndexIngest.delete(spark, path, "codes", ids, "vec_id")
  }

  /** Reclaim segment dirs the current manifest does not name (codes AND
    * superseded tombstone-ledger segments). WRITER-ONLY, serialized with
    * append/compact/delete; see [[IndexIngest.vacuum]]. */
  def vacuum(spark: SparkSession, path: String, retainSnapshots: Int = 1): Unit =
    IndexIngest.vacuum(spark, path, "codes", retainSnapshots)

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    graft.sources.BuildStamp.requireCommitted(spark, path, r, "IVF-ADC index")
    (r.getAs[Int]("m"), r.getAs[Int]("dim"))
  }

  /** Append new vectors WITHOUT retraining — the ingest-maintenance path
    * every persisted index here carries ([[IvfIndex.append]],
    * [[BandIndex.append]]): assign the batch against the PERSISTED coarse
    * centroids, encode its residuals with the STORED codebooks (parameters
    * from `meta/`, never the caller), and append the codes to the cluster
    * partitions. Steady-state ingest cost is independent of index size —
    * the existing codes are never read, let alone re-encoded. Codebooks
    * drift from the true corpus distribution as appends accumulate
    * (quantization error grows for batches unlike the training corpus);
    * periodic `build` is the re-train, exactly like any inverted index.
    *
    * Ingest-maintenance semantics (exactly-once id screen with in-batch
    * dedup, INSERT-ONLY — a re-embedded existing id is dropped, not
    * updated; rebuild to refresh — invisible segment staging + atomic
    * manifest flip, self-compaction past `maxSegments` live segments,
    * single writer) are the shared [[IndexIngest]] sequence — one
    * definition with [[IvfIndex.append]], so the two cannot drift. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      maxSegments: Int = 16): Unit = {
    val (m, dim) = meta(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
    val books = spark.read.parquet(s"$path/codebooks")
    IndexIngest.appendScreened(spark, path, "codes", batch, "vec_id",
      fresh => encodeResiduals(residualsOf(fresh, centroids), books, m, dim),
      maxSegments)
  }

  /** Multi-probe ADC top-k against the persisted index: each query probes
    * its `probes` nearest coarse clusters and scores ONLY those partitions'
    * code rows, each against the ADC table of the query's residual vs that
    * cluster's centroid. Returns (query_id, neighbor_id, adc_dist), dist
    * ASC. The caller's (m, dim) are validated against the stored `meta/`
    * authority — scoring codes under drifted parameters would be silent
    * garbage. */
  def searchTopK(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, dim: Int, k: Int, probes: Int): DataFrame = {
    require(probes >= 1)
    val (m0, dim0) = meta(spark, path)
    require(m == m0 && dim == dim0,
      s"index at $path was built with (m=$m0, dim=$dim0) but the caller " +
        s"passed (m=$m, dim=$dim) — ADC lookups under drifted parameters " +
        "are silent garbage; pass the stored parameters or rebuild")
    val centroids = spark.read.parquet(s"$path/centroids")
    val books = spark.read.parquet(s"$path/codebooks")
    val codesLive = IndexIngest.readLive(spark, path, "codes")
    val probed = queries
      .crossJoin(broadcast(Similarity.packedCentroids(centroids)))
      .select(
        explode(Similarity.nearestCentroids(col("embedding"), col("cents"), probes))
          .as("cluster"),
        col("vec_id").as("query_id"), col("embedding"))
      .join(broadcast(coarseCents(centroids)), "cluster")
      .crossJoin(broadcast(ProductQuantizer.packedAll(books)))
      .select(col("cluster"), col("query_id"),
        ProductQuantizer.adcTablesCol(
          residual(col("embedding"), col("__cvec")), col("all"), m, dim)
          .as("tables"))
    val scored = codesLive.join(broadcast(probed), "cluster")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ProductQuantizer.adcDistance(col("tables"), col("codes"), m).as("adc_dist"))
    ProductQuantizer.topKByDistAsc(scored, k)
  }

  /** Two-stage serving from the persisted index — [[searchTopK]]'s probed,
    * code-only scan shortlists `shortlist` candidates per query, then ONLY
    * those fetch raw vectors from `raw` (vec_id, embedding — e.g.
    * [[IvfIndex.corpus]] over a raw-vector index sharing the corpus, or
    * the source table itself) and rerank by exact L2. This is the full
    * production IVFADC+R pipeline: coarse pruning bounds I/O, PQ codes
    * bound memory, and the rerank confines the expensive exact distance to
    * a heap-bounded set — the rerank stage is the ONE shared
    * [[ProductQuantizer.rerankExact]] definition, so the flat and indexed
    * paths rank identically. With probes = all clusters and shortlist ≥
    * corpus size the result is exactly brute-force L2 (spec-asserted). */
  def searchTopKRerank(spark: SparkSession, path: String, queries: DataFrame,
      m: Int, dim: Int, k: Int, probes: Int, shortlist: Int,
      raw: DataFrame): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    ProductQuantizer.rerankExact(
      searchTopK(spark, path, queries, m, dim, shortlist, probes), queries,
      raw.select("vec_id", "embedding"), k)
  }
}
