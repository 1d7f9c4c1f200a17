package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.VectorFunctions.vectorSum

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the vector-compression layer of an ANN
  * index: split each `dim`-dimensional embedding into `m` subvectors, train
  * an independent k-means codebook of `k` sub-centroids per subspace, and
  * store each vector as `m` small codes. At k=16/m=8 a 64-dim float vector
  * (256 bytes) becomes 8 nibbles — the difference between an index that
  * fits in cluster memory at 100 TB and one that doesn't.
  *
  * Distributed shape: training reshapes the corpus ONCE into
  * (vec_id, subspace, subvec) rows — all m subspaces train TOGETHER, each
  * Lloyd round being one broadcast-assignment pass (row-local L2 argmin
  * against the per-subspace centroid array) plus ONE (subspace, cid)-keyed
  * [[graft.expressions.VectorSum]] aggregate; m×k×(dim/m +1) doubles on the
  * wire per round, never the corpus. Empty clusters keep their previous
  * centroid (left-join + coalesce) so k is stable and runs deterministic.
  * Encoding is a pure map: the full codebook set packs into one broadcast
  * row and every code is a row-local argmin expression — zero shuffles.
  *
  * Everything is L2 (the quantity PQ preserves); determinism: seeds are the
  * k lowest-id vectors, ties in the argmin break to the smaller code.
  */
object ProductQuantizer {

  /** Exact squared L2 distance between two numeric arrays, in doubles. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Code (cid) of the L2-nearest entry of `cents`
    * (`array<struct<cid bigint, cvec array<double>>>`): min over
    * (distance, cid) structs — struct ordering IS the argmin with the
    * smaller-cid tiebreak, and each distance is computed exactly once
    * (a fold comparing inside `when` would re-evaluate the O(sub) l2sq
    * per comparison; this is the hottest path of encode/train). */
  def nearestCode(vec: Column, cents: Column): Column =
    array_min(transform(cents, c =>
      struct(l2sq(vec, c.getField("cvec")).as("d"),
        c.getField("cid").as("cid"))))
      .getField("cid")

  /** The corpus reshaped to one row per (vec_id, subspace, subvec). */
  private def subvectors(corpus: DataFrame, m: Int, sub: Int): DataFrame =
    corpus.select(col("vec_id"), posexplode(array((0 until m).map(j =>
        slice(col("embedding"), j * sub + 1, sub)): _*))
      .as(Seq("subspace", "subvec")))

  /** Train the per-subspace codebooks: returns (subspace, cid, cvec) with
    * cid in [0, k) and cvec in doubles. */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && iters >= 0)
    val sub = dim / m
    val parts = subvectors(corpus, m, sub).localCheckpoint(eager = false)
    // seeds: the k lowest-id vectors, their subvectors numbered 0..k-1 —
    // the k-row window is a deliberate tiny-frame sort, same as kmeans init
    val seedIds = corpus.select("vec_id").orderBy("vec_id").limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy("vec_id")).cast("long") - 1)
    var centroids = parts.join(broadcast(seedIds), "vec_id")
      .select(col("subspace"), col("cid"),
        transform(col("subvec"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val packed = centroids.groupBy("subspace")
        .agg(collect_list(struct(col("cid"), col("cvec"))).as("cents"))
      val assigned = parts.join(broadcast(packed), "subspace")
        .select(col("subspace"), col("subvec"),
          nearestCode(col("subvec"), col("cents")).as("cid"))
      val updated = assigned.groupBy("subspace", "cid").agg(
          count(when(size(col("subvec")) === sub, 1)).as("n"),
          vectorSum(col("subvec"), sub).as("s"))
        .select(col("subspace"), col("cid"),
          transform(col("s"), x => x / col("n")).as("unew"))
      centroids = centroids.join(updated, Seq("subspace", "cid"), "left")
        .select(col("subspace"), col("cid"),
          coalesce(col("unew"), col("cvec")).as("cvec")) // empty cluster: keep
        .localCheckpoint(eager = false)
    }
    centroids
  }

  /** All codebooks packed into ONE row:
    * `array<struct<subspace int, cents array<struct<cid, cvec>>>>`. */
  private[operators] def packedAll(codebooks: DataFrame): DataFrame =
    codebooks.groupBy("subspace")
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("cents"))
      .agg(collect_list(struct(col("subspace"), col("cents"))).as("all"))

  private def centsOf(all: Column, j: Column): Column =
    element_at(filter(all, s => s.getField("subspace") === j), 1)
      .getField("cents")

  /** Encode every corpus vector as its `m` codes — a pure map against the
    * single-row broadcast codebook set, zero shuffles. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    corpus.crossJoin(broadcast(packedAll(codebooks)))
      .select(col("vec_id"), array((0 until m).map { j =>
        nearestCode(slice(col("embedding"), j * sub + 1, sub),
          centsOf(col("all"), lit(j)))
      }: _*).as("codes"))
  }

  /** Reconstruct the quantized approximation of each encoded vector:
    * the concatenation of its chosen sub-centroids. Row-local. */
  def decode(encoded: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    encoded.crossJoin(broadcast(packedAll(codebooks)))
      .select(col("vec_id"), flatten(transform(sequence(lit(0), lit(m - 1)), j =>
        element_at(filter(centsOf(col("all"), j),
          c => c.getField("cid") === element_at(col("codes"), j + 1)), 1)
          .getField("cvec"))).as("approx"))

  /** Asymmetric-distance (ADC) top-k: queries stay RAW, the corpus is its
    * PQ codes — the standard PQ search. Each query first builds its m×k
    * lookup table (squared L2 from each of its subvectors to every
    * sub-centroid — row-local against the broadcast codebooks), then every
    * corpus code row scores as m table lookups summed in fixed subspace
    * order (IEEE-deterministic), never touching the raw corpus vectors.
    * One pass over the code table per query batch; top-k through the
    * k-bounded-heap operator, no window. Returns
    * (query_id, neighbor_id, adc_dist) with dist ASC, id-tiebroken. */
  /** The ADC lookup-table EXPRESSION: tables[j][c+1] = squared L2 from
    * `emb`'s subvector j to sub-centroid c of the packed codebook column
    * `all` — row-local. array_sort orders the cid-first structs so table
    * position c+1 <-> cid c. Exposed as a Column so [[IvfAdc]] can build
    * per-(query, cluster) tables from query RESIDUALS. */
  private[operators] def adcTablesCol(emb: Column, all: Column,
      m: Int, dim: Int): Column = {
    val sub = dim / m
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(array_sort(centsOf(all, j)), c =>
        l2sq(slice(emb, j * sub + 1, lit(sub)), c.getField("cvec"))))
  }

  /** Per-query ADC lookup tables (query_id, tables) against the broadcast
    * codebooks. */
  private[operators] def adcTables(queries: DataFrame, codebooks: DataFrame,
      m: Int, dim: Int): DataFrame =
    queries.crossJoin(broadcast(packedAll(codebooks)))
      .select(col("vec_id").as("query_id"),
        adcTablesCol(col("embedding"), col("all"), m, dim).as("tables"))

  /** ADC distance of one code row against one query table set: m lookups
    * summed in fixed subspace order (IEEE-deterministic). */
  private[operators] def adcDistance(tables: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
      acc + element_at(element_at(tables, (j + 1).cast("int")),
        element_at(codes, (j + 1).cast("int")).cast("int") + 1))

  /** Top-k per query by (adc_dist ASC, neighbor_id ASC) through the
    * k-bounded-heap operator — the ONE definition of the ADC ranking
    * contract, shared by the flat scan and the IVF-ADC index so the two
    * paths can't drift. */
  private[operators] def topKByDistAsc(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerGroup(
      scored.withColumn("__neg_d", -col("adc_dist"))
        .withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("query_id"),
      order = Seq("__neg_d", "__neg_id"),
      k = k)
      .select("query_id", "neighbor_id", "adc_dist")

  def adcTopK(encoded: DataFrame, queries: DataFrame, codebooks: DataFrame,
      m: Int, dim: Int, k: Int): DataFrame = {
    val qt = adcTables(queries, codebooks, m, dim)
    val scored = encoded.crossJoin(broadcast(qt))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcDistance(col("tables"), col("codes"), m).as("adc_dist"))
    topKByDistAsc(scored, k)
  }

  /** Violations of the ENCODE contract over `corpus` + its `encoded` codes,
    * expected EMPTY — the oracle-checkable form of "the codes are right"
    * (iterative training itself has no SQL analogue, but every property of
    * its OUTPUT does). Kinds:
    *   - `cardinality`: a vector whose code array isn't exactly m long, or
    *     a code row with no corpus vector / vector with no code row;
    *   - `range`: a code outside [0, k);
    *   - `argmin`: the chosen sub-centroid is not a true L2 minimizer of
    *     the subvector, or a tie was broken away from the smallest cid.
    * The argmin check re-derives the minimum with an INDEPENDENT reduction
    * (array_min over plain distances + an explicit equality-tie filter)
    * rather than the struct-min [[nearestCode]] uses, so an encoder bug
    * can't cancel out of its own verification. */
  def encodeViolations(corpus: DataFrame, encoded: DataFrame,
      codebooks: DataFrame, m: Int, k: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val badLen = encoded.filter(size(col("codes")) =!= m)
      .select(col("vec_id"), lit(null).cast("int").as("subspace"),
        lit(null).cast("long").as("code"), lit("cardinality").as("kind"))
    val rows = encoded.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("subspace", "code")))
    val joined = rows.join(corpus.select("vec_id", "embedding"), Seq("vec_id"), "full")
      .crossJoin(broadcast(packedAll(codebooks)))
    val dists = transform(centsOf(col("all"), col("subspace")), c =>
      struct(l2sq(slice(col("embedding"), col("subspace") * sub + 1, lit(sub)),
        c.getField("cvec")).as("d"), c.getField("cid").as("cid")))
    val dmin = array_min(transform(dists, s => s.getField("d")))
    val chosenD = element_at(
      filter(dists, s => s.getField("cid") === col("code")), 1).getField("d")
    val bestCid = array_min(
      filter(dists, s => s.getField("d") === dmin)).getField("cid")
    val kind =
      when(col("code").isNull || col("embedding").isNull, "cardinality")
        .when(col("code") < 0 || col("code") >= k, "range")
        .when(chosenD > dmin || col("code") =!= bestCid, "argmin")
    joined.withColumn("kind", kind).filter(col("kind").isNotNull)
      .select(col("vec_id"), col("subspace"), col("code"), col("kind"))
      .unionByName(badLen)
  }

  /** Violations of the ADC top-k contract, expected EMPTY. Kinds:
    *   - `adc_identity`: a returned row whose adc_dist differs from the
    *     exact squared L2 between the raw query and the DECODED neighbor
    *     (ADC over full codebook tables IS that distance, so the identity
    *     is tolerance-tight at 1e-9 relative — fp summation order is the
    *     only slack);
    *   - `topk_completeness`: a corpus vector NOT returned for a query that
    *     lexicographically beats (adc_dist, neighbor_id) the worst returned
    *     row — i.e. the k-bounded heap dropped a better candidate. */
  def adcTopKViolations(encoded: DataFrame, queries: DataFrame,
      codebooks: DataFrame, m: Int, dim: Int, k: Int): DataFrame = {
    val top = adcTopK(encoded, queries, codebooks, m, dim, k)
      .localCheckpoint(eager = false)
    val recon = decode(encoded, codebooks, m)
      .withColumnRenamed("vec_id", "neighbor_id")
    val idv = top
      .join(recon, "neighbor_id")
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__q")), "query_id")
      .withColumn("__exact",
        aggregate(zip_with(col("__q"), col("approx"),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      .filter(abs(col("adc_dist") - col("__exact")) >
        lit(1e-9) * greatest(lit(1.0), col("__exact")))
      .select(col("query_id"), col("neighbor_id"), lit("adc_identity").as("kind"))
    val qt = adcTables(queries, codebooks, m, dim)
    val scored = encoded.crossJoin(broadcast(qt))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcDistance(col("tables"), col("codes"), m).as("adc_dist"))
    val worst = top.groupBy("query_id")
      .agg(max(struct(col("adc_dist"), col("neighbor_id"))).as("__w"))
    val cmpl = scored
      .join(top.select("query_id", "neighbor_id").withColumn("__in", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .filter(col("__in").isNull)
      .join(worst, "query_id")
      .filter(struct(col("adc_dist"), col("neighbor_id")) < col("__w"))
      .select(col("query_id"), col("neighbor_id"),
        lit("topk_completeness").as("kind"))
    idv.unionByName(cmpl)
  }

  /** Two-stage ADC serving with exact reranking — the standard production
    * ANN shape (Jégou et al.'s IVFADC + R): the compressed code table
    * produces a `shortlist`-sized candidate set per query (cheap, m table
    * lookups per code row, raw vectors untouched), then ONLY those
    * candidates fetch their raw vectors and rerank by exact L2
    * ([[graft.operators.Similarity.bruteForceTopKL2]]'s rounding + ordering
    * contract, so rerank output is directly comparable to the brute-force
    * truth — with `shortlist` = corpus size the two are identical by
    * construction). Recall@k can only improve over plain [[adcTopK]] at the
    * same k: the exact ordering inside the shortlist never demotes a true
    * neighbor the ADC ordering had promoted.
    *
    * Scale shape: the ADC stage is [[adcTopK]] (one code-table pass,
    * k-bounded heaps); the rerank stage joins the |Q|·shortlist-row
    * candidate list (BROADCAST — it is heap-bounded by construction)
    * against one scan of the raw corpus, scores row-locally, and collapses
    * through the same k-heap. The raw corpus is touched exactly once, never
    * shuffled, and only shortlisted rows carry vectors past the scan. */
  def adcRerankTopK(encoded: DataFrame, queries: DataFrame,
      codebooks: DataFrame, corpus: DataFrame, m: Int, dim: Int,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    rerankExact(
      adcTopK(encoded, queries, codebooks, m, dim, shortlist), queries,
      corpus, k)
  }

  /** The exact-rerank stage shared by the flat scan ([[adcRerankTopK]]) and
    * the persisted index ([[IvfAdc.searchTopKRerank]]) — ONE definition so
    * the two serving paths cannot drift: the heap-bounded `cand`idate list
    * (query_id, neighbor_id, …) is BROADCAST against one scan of the raw
    * `corpus` (vec_id, embedding), each surviving pair scores exact L2
    * row-locally under [[Similarity.bruteForceTopKL2]]'s rounding/ordering
    * contract, and the k-heap keeps the top k. The raw corpus is touched
    * once and never shuffled; only shortlisted rows carry vectors past the
    * scan. */
  private[operators] def rerankExact(cand: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("__nv"))
      .join(broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions
          .l2Rounded(col("__qv"), col("__nv")).as("dist"))
    graft.plans.TopKPerGroup(
      scored.withColumn("__neg_d", -col("dist"))
        .withColumn("__neg_id", -col("neighbor_id")),
      group = Seq("query_id"),
      order = Seq("__neg_d", "__neg_id"),
      k = k)
      .select("query_id", "neighbor_id", "dist")
  }
}
