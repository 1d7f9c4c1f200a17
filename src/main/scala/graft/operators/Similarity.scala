package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Brute-force is the correctness baseline: broadcast the (small) query set
  * against the corpus — one pass over the corpus, no shuffle of the corpus
  * itself, then a per-query top-k window. The scale path is IVF: assign every
  * corpus vector to its nearest coarse centroid once (row-local against a
  * broadcast centroid table), then probe only matching clusters — turning a
  * full scan into a cluster-pruned scan, exactly how an IVF index trades
  * recall for throughput at 100 TB.
  */
object Similarity {

  /** Top-k rows per `query_id` by (sim DESC, neighbor_id ASC) through the
    * engine's k-bounded-heap operator ([[graft.plans.TopKPerGroup]], no
    * per-partition sort — beats the row_number window ~25%). The heap keeps
    * lexicographic maxima under ascending orders, so the ascending-id
    * tiebreak rides as a negated column. */
  private def topKBySim(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      scored.withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("query_id"),
      order = Seq("sim", "__neg_id"),
      k = k)
      .select("query_id", "neighbor_id", "sim")

  /** Top-k neighbors per query vector by cosine (rounded to 4dp; ties broken
    * by neighbor id so results are total-ordered and oracle-stable). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosineRounded(col("q.embedding"), col("c.embedding")).as("sim"))
    topKBySim(joined, k)
  }

  /** Assign each vector to the nearest of the broadcast `centroids` by
    * cosine. Returns the input plus a `cluster` column. */
  def assignClusters(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = Parallelism.fanOut(vectors).alias("v")
      .crossJoin(broadcast(centroids.select(
        col("vec_id").as("centroid_id"), col("embedding").as("centroid"))))
      .withColumn("c_sim", cosine(col("v.embedding"), col("centroid")))
    val w = Window.partitionBy(col("v.vec_id"))
      .orderBy(col("c_sim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "c_sim", "centroid")
      .withColumnRenamed("centroid_id", "cluster")
  }

  /** IVF-style ANN: both corpus and queries are assigned to coarse clusters;
    * each query searches only its own cluster (single-probe). Approximate by
    * construction — recall depends on centroid quality and probe count. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int): DataFrame = {
    val corpusC = assignClusters(corpus, centroids)
      .select(col("cluster"), col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val queriesC = assignClusters(queries, centroids)
      .select(col("cluster"), col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val joined = queriesC.join(corpusC, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
    topKBySim(joined, k)
  }

  /** Lloyd's k-means for training the IVF coarse centroids — the piece that
    * turns [[ivfTopK]] from "centroids given" into a self-contained index
    * build. Deterministic: init = the k lowest-id vectors, fixed `iters`
    * Lloyd rounds, cosine assignment with the same id-tiebreak as
    * [[assignClusters]].
    *
    * Scale shape: each round is ONE pass — assignment is row-local against
    * the broadcast centroid table, and the centroid update is a single
    * map-side-combined HashAggregate of `dim` per-dimension sums + a count
    * (no explode: k×(dim+1) doubles shuffle, nothing else). The tiny
    * centroid frame is localCheckpoint-ed per round so the iterative
    * lineage stays bounded (same pattern as
    * [[Dedup.connectedComponents]]). */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    require(k > 0 && iters >= 0 && dim > 0)
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assignClusters(corpus, centroids)
      val sums = assigned.groupBy("cluster").agg(
        count(lit(1)).as("n"),
        (0 until dim).map(i =>
          sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i")): _*)
      centroids = sums.select(
        col("cluster").as("vec_id"),
        array((0 until dim).map(i => (col(s"s$i") / col("n")).cast("float")): _*)
          .as("embedding"))
        .localCheckpoint()
    }
    centroids
  }

  /** Sign-LSH bucket key: bit i is the sign of component `planes(i)` —
    * random-hyperplane LSH with axis-aligned planes (valid for cosine;
    * no trained centroids, no randomness, fully deterministic across
    * engines and cluster layouts). Row-local. */
  def signLshBucket(vec: Column, planes: Seq[Int]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(element_at(vec, p + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN (the hyperplane alternative to [[ivfTopK]]): corpus
    * and queries hash to sign buckets; each query searches only its bucket.
    * One equi-join on the bucket key — the corpus shuffles by bucket once,
    * candidate count is corpus/2^bits in expectation. Single-probe
    * (multi-probe = also search buckets at Hamming distance 1 from the
    * query's key — same join with a generated probe-key column). */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, planes: Seq[Int],
      k: Int): DataFrame =
    lshBucketTopK(corpus, queries, planes, k, probes = 1)

  /** Multi-probe variant: each query also searches the buckets whose keys
    * differ from its own in one bit (`probes` = 1 + number of 1-bit flips
    * explored, capped at the plane count). Near-misses across a hyperplane —
    * the dominant LSH recall loss — land in Hamming-adjacent buckets, so
    * probing them recovers recall without touching the corpus layout: the
    * probe keys are a generated column on the (small) query side and the
    * join stays a plain bucket-keyed equi-join. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, planes: Seq[Int],
      k: Int, probes: Int): DataFrame = {
    require(probes >= 1 && probes <= planes.length + 1)
    val corpusB = Parallelism.fanOut(corpus).select(
      signLshBucket(col("embedding"), planes).as("bucket"),
      col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val own = signLshBucket(col("embedding"), planes)
    val probeKeys = array((0 until probes).map {
      case 0 => own
      case i => own.bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val queriesB = queries.select(
      explode(probeKeys).as("bucket"),
      col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val joined = queriesB.join(corpusB, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
    topKBySim(joined, k)
  }
}
