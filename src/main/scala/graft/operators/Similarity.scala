package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  private[operators] def topKBySim(scored: DataFrame, k: Int): DataFrame =
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

  /** Top-k neighbors per query by exact Euclidean distance (rounded 4dp,
    * ascending, id-tiebroken) — the ground-truth leg of ADC recall
    * evaluation, where cosine truth would mis-rank unnormalized vectors
    * (ADC approximates squared L2, not the angle). Same scale shape as
    * [[bruteForceTopK]]: broadcast query set against one corpus scan,
    * k-bounded heap. */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        graft.functions.VectorFunctions
          .l2Rounded(col("q.embedding"), col("c.embedding")).as("dist"))
    graft.plans.TopKPerGroup(
      joined.withColumn("__neg_d", -col("dist"))
        .withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("query_id"),
      order = Seq("__neg_d", "__neg_id"),
      k = k)
      .select("query_id", "neighbor_id", "dist")
  }

  /** Scalar-quantized (SQ8) similarity search — the FAISS `SQ8` memory
    * story: the corpus is stored as int8 codes (`floor(x·127)`, the
    * `emb_quantize` accounting contract — 4× smaller than float32, 8×
    * smaller than float64) and scored ASYMMETRICALLY: the query stays raw,
    * each corpus code dequantizes row-locally (`c/127`) inside the scan and
    * ranks by cosine against the raw query. Unlike PQ/ADC there is no
    * trained codebook, so the whole path is closed-form and the oracle
    * re-derives it EXACTLY (no gated-floor pattern needed). Same scale
    * shape as [[bruteForceTopK]]: broadcast query set, one corpus scan,
    * k-bounded heap; the IVF probed scan is the drop-in 100 TB scan side.
    * Cosine is composed dot/(norm·norm) over the dequantized doubles
    * (forward-order accumulation, 4dp-rounded — the engine's float
    * determinism contract). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def deq(c: Column): Column =
      transform(c, x => floor(x.cast("double") * 127).cast("double") / 127.0)
    def cos(q: Column, c: Column): Column =
      round(dot(q, c) / (norm(q) * norm(c)), 4)
    val joined = Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cos(col("q.embedding"), deq(col("c.embedding"))).as("sim"))
    topKBySim(joined, k)
  }

  /** Binary-quantized similarity search — 1 bit per dimension (the extreme
    * end of the quantization ladder after [[sq8TopK]] and
    * [[graft.operators.IvfAdc]]): each vector packs to its sign bits (two
    * 32-dim halves in two longs, so a 64-dim float vector becomes 8 bytes)
    * and neighbors rank by HAMMING distance — XOR + popcount, the cheapest
    * similarity primitive there is and the standard first-pass filter for
    * billion-scale retrieval. Exact integer arithmetic end to end, so the
    * oracle re-derives it bit-for-bit. Ties break to the smaller neighbor
    * id; same broadcast-queries/one-scan/k-heap shape as the other
    * brute-force paths. */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // MSB-first fold: bit for dimension `from` lands highest (acc·2 + b
    // per step — pure integer ops; the oracle mirrors the same weights as
    // explicit 1 << (len − offset) shift sums)
    def bits(emb: Column, from: Int, len: Int): Column =
      aggregate(sequence(lit(from), lit(from + len - 1)), lit(0L), (acc, i) =>
        acc * 2 + when(element_at(emb, i.cast("int")) > 0, 1L).otherwise(0L))
    def packed(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
        bits(col("embedding"), 1, 32).as("__hi"),
        bits(col("embedding"), 33, 32).as("__lo"))
    val joined = Parallelism.fanOut(packed(corpus)).alias("c")
      .crossJoin(broadcast(packed(queries).alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        (bit_count(col("q.__hi").bitwiseXOR(col("c.__hi"))) +
          bit_count(col("q.__lo").bitwiseXOR(col("c.__lo"))))
          .cast("long").as("hamming"))
    graft.plans.TopKPerGroup(
      joined.withColumn("__neg_h", -col("hamming"))
        .withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("query_id"),
      order = Seq("__neg_h", "__neg_id"),
      k = k)
      .select("query_id", "neighbor_id", "hamming")
  }

  /** Two-stage binary-then-exact retrieval: [[binaryTopK]]'s Hamming scan
    * shortlists `shortlist` candidates per query (XOR+popcount over 8-byte
    * packed vectors — the cheap first pass), then ONLY those fetch raw
    * vectors and rerank by exact cosine through the engine's k-heap — the
    * standard binary-quantization serving pipeline. Both stages are
    * closed-form, so unlike the PQ rerank the ENTIRE two-stage result is
    * exactly re-derivable by the oracle. Scale shape: one packed-corpus
    * scan + heap, then the heap-bounded candidate list broadcast against
    * one raw-corpus scan + second heap; raw vectors move only for
    * shortlisted rows. */
  def binaryRerankTopK(corpus: DataFrame, queries: DataFrame,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val cand = binaryTopK(corpus, queries, shortlist)
      .select("query_id", "neighbor_id")
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("__nv"))
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineRounded(col("__qv"), col("__nv")).as("sim"))
    topKBySim(scored, k)
  }

  /** Radius (threshold) similarity search — the FAISS `range_search`
    * analogue: ALL corpus neighbors of each query at cosine ≥ `minSim`
    * (4dp-rounded, so the boundary is the same value both engines
    * compare), not a fixed k. This is the retrieval shape dedup audits and
    * recall-oriented RAG use — "everything at least this similar" — where
    * a top-k would silently truncate dense neighborhoods and pad sparse
    * ones.
    *
    * Scale shape: the bounded query set broadcasts, the corpus is scanned
    * ONCE with a row-local cosine + threshold predicate — no corpus
    * shuffle, no window, no heap; the output is bounded by the threshold,
    * not by |Q|×|C|. For 100 TB corpora the scan side swaps for the IVF
    * probed scan exactly as with [[bruteForceTopK]] (range search probes
    * the same nearest clusters; the threshold predicate is unchanged). */
  def rangeSearch(corpus: DataFrame, queries: DataFrame,
      minSim: Double): DataFrame =
    Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosineRounded(col("q.embedding"), col("c.embedding")).as("sim"))
      .filter(col("sim") >= minSim)

  /** Hard-negative mining for contrastive training (the sampling step
    * behind every embedder/reranker fine-tune): for each query vector, the
    * `k` highest-cosine corpus vectors whose `label` DIFFERS from the
    * query's — same-label candidates are presumed positives and excluded,
    * so the output is exactly the "hardest" negatives: maximally confusable
    * cross-class pairs. `simUpper` additionally caps the similarity
    * (exclusive): cross-label rows at near-identical similarity are
    * overwhelmingly mislabeled duplicates, and training on them as
    * negatives poisons the objective — the standard denoised-hard-negative
    * guard (e.g. SimCSE-style filtering). The default (+Infinity) is a
    * true no-cap: even pairs whose 4dp-rounded cosine lands exactly on 1.0
    * pass through — a default must not silently filter. Callers mining
    * from corpora with ANY label noise should pass a cap (the judged
    * entries use 0.95); with the default, exact cross-label duplicates
    * surface as the top "negatives".
    *
    * Scale shape is [[bruteForceTopK]]'s: the query set broadcasts, the
    * corpus is scanned ONCE with a row-local cosine + label predicate, and
    * the per-query top-k is the k-bounded heap — no corpus shuffle, no
    * window sort. For 100 TB corpora swap the scan side for the IVF probed
    * scan exactly as with search. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      simUpper: Double = Double.PositiveInfinity): DataFrame = {
    val joined = Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id") &&
        col("q.label") =!= col("c.label"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        cosineRounded(col("q.embedding"), col("c.embedding")).as("sim"))
      .filter(col("sim") < simUpper)
    topKBySim(joined, k)
  }

  /** Contrastive-triplet assembly — the training-pair export downstream of
    * [[hardNegatives]]: per query, the single best same-label neighbor (the
    * positive) paired with each of the `kNeg` hardest cross-label neighbors
    * (the negatives), plus the similarity `margin = pos_sim − neg_sim` that
    * a triplet loss trains on (small/negative margin = the informative
    * triplets). Queries with NO same-label candidate drop out (no positive
    * exists to anchor a triplet). `simUpper` is [[hardNegatives]]'
    * mislabeled-duplicate cap on the negative side.
    *
    * Scale shape: ONE scored definition feeds both branches, each of which
    * collapses through the k-bounded heap BEFORE the tiny pos × neg join —
    * the corpus is scanned twice (once per branch) rather than
    * materializing the |Q|×|C| scored frame, which at 100 TB is the right
    * trade (the scan is cheap, the scored frame is not storable). */
  def contrastiveTriplets(corpus: DataFrame, queries: DataFrame, kNeg: Int,
      simUpper: Double = Double.PositiveInfinity): DataFrame = {
    val scored = Parallelism.fanOut(corpus).alias("c")
      .crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        (col("q.label") === col("c.label")).as("same"),
        cosineRounded(col("q.embedding"), col("c.embedding")).as("sim"))
    val pos = topKBySim(scored.filter(col("same")).drop("same"), 1)
      .select(col("query_id"), col("neighbor_id").as("pos_id"),
        col("sim").as("pos_sim"))
    val neg = topKBySim(
      scored.filter(!col("same") && col("sim") < simUpper).drop("same"), kNeg)
      .select(col("query_id"), col("neighbor_id").as("neg_id"),
        col("sim").as("neg_sim"))
    // both sides are query-set-sized after the heaps, but the heap operator
    // carries no stats so Spark would sort-merge; the 1-row-per-query pos
    // side is the natural broadcast
    broadcast(pos).join(neg, "query_id")
      .select(col("query_id"), col("pos_id"), col("neg_id"),
        round(col("pos_sim") - col("neg_sim"), 4).as("margin"))
  }

  /** The centroid table packed into ONE row holding
    * `array<struct<cid, cvec>>` — the shape [[graft.expressions.NearestCentroids]]
    * consumes. Joining this single row in via `broadcast` + `crossJoin` adds
    * the centroid array to every corpus row WITHOUT exchanging the corpus
    * (a 1-row broadcast nested loop is row-local by construction). */
  private[operators] def packedCentroids(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(struct(
      col("vec_id").cast("long").as("cid"),
      col("embedding").as("cvec"))).as("cents"))

  /** Ids of the `probes` nearest centroids by (cosine DESC, cid ASC) — a
    * single codegen'd per-row expression, no window, no exchange. */
  def nearestCentroids(vec: Column, cents: Column, probes: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.NearestCentroids(
        org.apache.spark.sql.GraftBridge.expression(vec),
        org.apache.spark.sql.GraftBridge.expression(cents),
        probes))

  /** Assign each vector to the nearest of the `centroids` by cosine
    * (ties → lowest centroid id). Returns the input plus a `cluster`
    * column. Row-local: the centroid table rides in as a single-row
    * broadcast array and the argmax is one expression — the corpus never
    * exchanges for assignment. A vector comparable to NO centroid
    * (dimension mismatch, null element ⇒ NearestCentroids yields an empty
    * array) gets a NULL cluster via try_element_at — under ANSI mode a
    * plain element_at would kill the job on the first malformed row —
    * and then drops out of every downstream cluster-keyed join/groupBy,
    * which is what kmeansCentroids' count(valid-only) divisor expects. */
  def assignClusters(vectors: DataFrame, centroids: DataFrame): DataFrame =
    Parallelism.fanOut(vectors)
      .crossJoin(broadcast(packedCentroids(centroids)))
      .withColumn("cluster",
        try_element_at(nearestCentroids(col("embedding"), col("cents"), 1), lit(1)))
      .drop("cents")

  /** IVF-style ANN: both corpus and queries are assigned to coarse clusters;
    * each query searches only its own cluster (single-probe). Approximate by
    * construction — recall depends on centroid quality and probe count. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int): DataFrame =
    ivfTopK(corpus, queries, centroids, k, probes = 1)

  /** Multi-probe IVF: each query searches its `probes` nearest clusters —
    * the first knob on any IVF index. A query near a cluster boundary
    * recovers its true neighbors from the adjacent cluster(s) without
    * touching the corpus layout: the corpus is still assigned single-probe
    * (each vector lives in exactly one cluster), only the (small) query
    * side fans out `probes` cluster keys, and the search stays one
    * cluster-keyed equi-join. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, probes: Int): DataFrame = {
    require(probes >= 1)
    val corpusC = assignClusters(corpus, centroids)
      .select(col("cluster"), col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val queriesC = queries
      .crossJoin(broadcast(packedCentroids(centroids)))
      .select(
        explode(nearestCentroids(col("embedding"), col("cents"), probes)).as("cluster"),
        col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val joined = queriesC.join(corpusC, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineRounded(col("q_vec"), col("n_vec")).as("sim"))
    topKBySim(joined, k)
  }

  /** The probe-sweep primitive behind recall-vs-probes tuning: top-`k`
    * neighbors per query for EVERY probe count 1..`maxProbes`, from ONE
    * candidate generation — the query fans out its `maxProbes` ranked
    * clusters once, each candidate carries the rank of the cluster it was
    * reached through, and a candidate reached at rank r is (by IVF
    * semantics) in the candidate set of every probes ≥ r, so the sweep is
    * an explode on the k-bounded candidate frame, NOT `maxProbes` separate
    * searches over the corpus. Returns (probes, query_id, neighbor_id,
    * sim); the `probes = p` slice is row-identical to `ivfTopK(..., p)`.
    * Scale shape: identical to [[ivfTopK]] at `maxProbes` — one
    * cluster-keyed equi-join — plus a ≤maxProbes× explode of its
    * candidates. */
  def ivfTopKByProbe(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, maxProbes: Int): DataFrame = {
    require(maxProbes >= 1)
    val corpusC = assignClusters(corpus, centroids)
      .select(col("cluster"), col("vec_id").as("neighbor_id"), col("embedding").as("n_vec"))
    val queriesC = queries
      .crossJoin(broadcast(packedCentroids(centroids)))
      .select(
        posexplode(nearestCentroids(col("embedding"), col("cents"), maxProbes))
          .as(Seq("prank", "cluster")),
        col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val candidates = queriesC.join(corpusC, "cluster")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineRounded(col("q_vec"), col("n_vec")).as("sim"),
        explode(sequence((col("prank") + 1).cast("long"), lit(maxProbes.toLong)))
          .as("probes"))
    graft.plans.TopKPerGroup(
      candidates.withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("probes", "query_id"),
      order = Seq("sim", "__neg_id"),
      k = k)
      .select("probes", "query_id", "neighbor_id", "sim")
  }

  /** Lloyd's k-means for training the IVF coarse centroids — the piece that
    * turns [[ivfTopK]] from "centroids given" into a self-contained index
    * build. Deterministic: init = the k lowest-id vectors, fixed `iters`
    * Lloyd rounds, cosine assignment with the same id-tiebreak as
    * [[assignClusters]].
    *
    * Scale shape: each round is ONE pass — assignment is row-local (the
    * [[nearestCentroids]] argmax expression over the single-row broadcast
    * centroid array), and the centroid update is ONE
    * [[graft.expressions.VectorSum]] aggregate + a count: map-side partial
    * buffers, k×(dim+1) doubles on the wire, nothing else. One array
    * aggregate instead of `dim` per-dimension sum columns — the latter
    * falls out of whole-stage codegen above `spark.sql.codegen.maxFields`
    * (100), i.e. at every real embedding dim. The tiny centroid frame is
    * localCheckpoint-ed per round so the iterative lineage stays bounded
    * (same pattern as [[Dedup.connectedComponents]]). */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    require(k > 0 && iters >= 0 && dim > 0)
    val vecSum = vectorSum(col("embedding"), dim)
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val assigned = assignClusters(corpus, centroids)
      // divisor counts exactly the rows VectorSum accumulated (valid
      // `dim`-length vectors) — count(*) would let malformed rows inflate
      // the divisor and bias every centroid toward zero
      val sums = assigned.groupBy("cluster").agg(
        count(when(size(col("embedding")) === dim, 1)).as("n"), vecSum.as("s"))
      centroids = sums.select(
        col("cluster").as("vec_id"),
        transform(col("s"), x => (x / col("n")).cast("float")).as("embedding"))
        .localCheckpoint(eager = false)
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

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-first
    * traversal — the 2-approximation behind active-learning and
    * dataset-distillation coresets): seed with the minimum id, then k−1
    * times add the point FARTHEST from its nearest chosen center.
    * Distance is cosine with the engine's 4dp cross-engine rounding
    * contract; ties break to the smaller id, so the trajectory is fully
    * deterministic. Returns (sel_round, vec_id, max_sim) where max_sim is
    * the winner's nearest-center similarity at selection time — read top
    * to bottom it IS the coverage-radius curve (the seed row carries −1).
    *
    * Scale shape: the nearest-center similarity is a COLUMN maintained
    * incrementally — each round cross-joins the ONE-ROW new center (the
    * BpeTrainer broadcast-winner discipline), updates
    * ms := max(ms, sim(x, c)), and localCheckpoints to keep the plan
    * flat — k corpus passes total (k·n distances, no pairwise blowup),
    * each winner a one-row TakeOrdered. k is the explicit, documented
    * cost knob; an already-selected point can only re-win if every point
    * sits at similarity 1.0 to some center (the corpus is a single
    * duplicate cloud — selection is then complete by definition). */
  def kCenterCoreset(vectors: DataFrame, idCol: Column, vecCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = vectors.select(idCol.as("vec_id"), vecCol.as("emb"))
      .localCheckpoint(eager = false)
    val seed = base.orderBy("vec_id").limit(1).localCheckpoint(eager = false)
    var out = seed.select(lit(1).as("sel_round"), col("vec_id"),
      lit(-1.0).as("max_sim"))
    var cur = base.crossJoin(broadcast(seed.select(col("emb").as("cemb"))))
      .select(col("vec_id"), col("emb"),
        cosineRounded(col("emb"), col("cemb")).as("ms"))
      .localCheckpoint(eager = false)
    for (r <- 2 to k) {
      val win = cur.orderBy(col("ms").asc, col("vec_id").asc).limit(1)
        .localCheckpoint(eager = false)
      out = out.unionByName(win.select(lit(r).as("sel_round"), col("vec_id"),
        col("ms").as("max_sim")))
      if (r < k) {
        cur = cur.crossJoin(broadcast(win.select(col("emb").as("cemb"))))
          .select(col("vec_id"), col("emb"),
            greatest(col("ms"),
              cosineRounded(col("emb"), col("cemb"))).as("ms"))
          .localCheckpoint(eager = false)
      }
    }
    out
  }

  /** Stochastic-greedy facility-location selection (Mirzasoleiman et al.
    * 2015, "Lazier Than Lazy Greedy", over the submodular objective of
    * Lin & Bilmes 2011): pick `k` points maximizing
    * f(S) = Σ_x max(0, max_{c∈S} sim(x, c)) — the REPRESENTATIVENESS
    * selection that complements [[kCenterCoreset]]'s pure-diversity
    * farthest-first (k-center covers the extremes; facility location
    * covers the mass). Each round scores only a hash-drawn candidate
    * pool (a point is a round-r candidate iff the first hex char of
    * md5("r:" + id) equals `candHex` — deterministic across engines,
    * runs, and partitionings; stochastic-greedy's (1 − 1/e − ε)
    * guarantee needs only O((n/k)·ln(1/ε)) candidates, so production
    * tightens the prefix as n grows while this fixture rate keeps the
    * pool ≈ n/16). Marginal gains are EXACT integers: similarities are
    * 4dp-pre-rounded scaled longs (the engine-parity contract), coverage
    * is clamped at 0, and the winner maximizes (gain, then min id).
    *
    * Scale shape per round: the corpus pays one pass against the
    * broadcast candidate pool (gain = one map-combined candidate-keyed
    * sum) and one pass against the single-row broadcast winner for the
    * coverage update — the corpus itself never shuffles; lineage is cut
    * per round with a lazy localCheckpoint (the [[kCenterCoreset]]
    * recompute argument).
    *
    * Returns one row per selection: (sel_round, vec_id, gain_scaled,
    * gain = gain_scaled/10⁴).
    */
  def facilityCoreset(vectors: DataFrame, idCol: Column, vecCol: Column,
      k: Int, candHex: String = "0"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def s4(a: Column, b: Column): Column =
      round(cosineRounded(a, b) * 10000, 0).cast("long")
    val base = vectors.select(idCol.as("vec_id"), vecCol.as("emb"))
      .localCheckpoint(eager = false)
    var cur = base.select(col("vec_id"), col("emb"), lit(0L).as("ms"))
      .localCheckpoint(eager = false)
    var out: DataFrame = null
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val pool = base.filter(
          substring(md5(concat(lit(s"$r:"), col("vec_id").cast("string"))),
            1, 1) === candHex)
        .select(col("vec_id").as("cand_id"), col("emb").as("cemb"))
      val cands =
        if (r == 1) pool
        else pool.join(broadcast(selected),
          pool("cand_id") === selected("sel_id"), "left_anti")
      val gains = cur.crossJoin(broadcast(cands))
        .select(col("cand_id"),
          greatest(lit(0L), s4(col("emb"), col("cemb")) - col("ms"))
            .as("g"))
        .groupBy("cand_id").agg(sum(col("g")).as("gain"))
      val win = gains.join(broadcast(cands), "cand_id")
        .orderBy(col("gain").desc, col("cand_id").asc).limit(1)
        .localCheckpoint(eager = false)
      val row = win.select(lit(r.toLong).as("sel_round"),
        col("cand_id").as("vec_id"), col("gain").as("gain_scaled"),
        (col("gain").cast("double") / 10000.0).as("gain"))
      out = if (out == null) row else out.unionByName(row)
      selected =
        if (selected == null) win.select(col("cand_id").as("sel_id"))
        else selected.unionByName(win.select(col("cand_id").as("sel_id")))
          .localCheckpoint(eager = false)
      if (r < k) {
        cur = cur.crossJoin(broadcast(win.select(col("cemb").as("wemb"))))
          .select(col("vec_id"), col("emb"),
            greatest(col("ms"), s4(col("emb"), col("wemb"))).as("ms"))
          .localCheckpoint(eager = false)
      }
    }
    out
  }
}
