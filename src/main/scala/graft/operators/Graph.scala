package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames. Companion to the
  * iterative propagation ops already in the engine (`ev_pagerank`'s power
  * iteration, [[Dedup.connectedComponents]]' min-label loop): these are the
  * single-pass structural counters.
  */
object Graph {

  /** Per-node triangle participation counts over an undirected simple
    * graph given as (u, v) edge rows (u ≠ v; duplicate/reversed edge rows
    * are collapsed first). Returns (node, n_triangles) for every node in
    * at least one triangle.
    *
    * Algorithm: degree-ordered edge orientation (the MapReduce triangle
    * counting of Suri & Vassilvitskii, WWW 2011): every edge orients from
    * its lower to its higher endpoint in the total order (degree, node),
    * wedges are pairs of out-neighbors, and a wedge closes into a triangle
    * iff its (order-sorted) endpoints are themselves an oriented edge —
    * each triangle is found exactly once, at its lowest-order corner.
    *
    * Scale shape: orientation caps out-degree at O(√m) on ANY graph (a
    * node of degree d > √m has all its edges pointed at it by lower-degree
    * neighbors), so the wedge self-join emits O(m^1.5) rows worst-case
    * instead of the O(Σ deg²) a hub would cost under naive per-node
    * pairing — degree ordering is precisely the skew defense. All joins
    * are equi-keyed (src; then the (dst_lo, dst_hi) closure lookup);
    * nothing is ever all-pairs. */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsFromOriented(orient(edges))

  /** The degree-ordered ORIENTATION of an undirected (u, v) edge frame:
    * (src, dst: struct(d, n)) rows where every edge points from its
    * lower to its higher endpoint in the (degree, node) total order.
    * Build-shaped (the checkpoint materializes the degree joins on first
    * use) and reusable: callers that count triangles repeatedly over one
    * graph snapshot should build this ONCE and re-query via
    * [[triangleCountsFromOriented]] — at 100 TB the orientation is the
    * corpus-scan half, the wedge count the query half. */
  def orient(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: (lo, hi) by node id, deduped
    val e = edges.toDF("eu", "ev")
      .filter(col("eu") =!= col("ev"))
      .select(least(col("eu"), col("ev")).as("lo"),
        greatest(col("eu"), col("ev")).as("hi"))
      .distinct()
    val deg = e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge from the smaller to the larger (deg, node); the
    // destination keeps its full order key so the wedge sort below shares
    // the orientation's total order
    val ordLo = struct(col("dlo").as("d"), col("lo").as("n"))
    val ordHi = struct(col("dhi").as("d"), col("hi").as("n"))
    // checkpoint: the oriented edge set is read THREE times (both wedge
    // legs + the closure lookup) — cut the lineage so the degree join
    // pipeline runs once. NOT LazyCheckpoint (the NnDescent build-shaped
    // rule): the degree joins want AQE's runtime broadcast — the lazy
    // form measured ev_triangles +33% calibration-normalized at sf0.1.
    e
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(ordLo < ordHi, col("lo")).otherwise(col("hi")).as("src"),
        when(ordLo < ordHi, ordHi).otherwise(ordLo).as("dst"))
      .localCheckpoint(eager = false)
  }

  /** Per-node triangle counts over an [[orient]]-ed edge frame — the
    * query half: wedge join + closure semi-join + explode/agg, zero
    * corpus-shaped work beyond the stored orientation. */
  def triangleCountsFromOriented(ori: DataFrame): DataFrame = {
    // wedges at each source: ordered out-neighbor pairs; the closing edge,
    // if present, is oriented exactly b -> c because orientation and the
    // wedge sort share one total order
    val wedges = ori.as("e1").join(ori.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"),
        col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tri = wedges.as("w").join(ori.as("e3"),
        col("w.b.n") === col("e3.src") && col("w.c") === col("e3.dst"),
        "left_semi")
      .select(col("a"), col("b.n").as("b"), col("c.n").as("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** `rounds`-round k-core peel: repeatedly drop nodes with current degree
    * < k and the edges they carry. Returns the surviving (node, deg) frame
    * — after enough rounds this is the k-core (the maximal subgraph where
    * every node keeps ≥ k neighbors), the standard "dense engaged core"
    * extraction.
    *
    * The round count is an EXPLICIT, documented contract (the BPE/k-means
    * iterative-loop discipline): both the engine and any oracle run
    * exactly `rounds` peels, so results are comparable even before the
    * fixpoint, and production sizes `rounds` to the measured peel depth
    * (degeneracy ordering converges in O(peel-depth) rounds, typically
    * tens even on web-scale graphs). Each round is two map-combined
    * degree aggregates + two semi-joins on the survivor set; per-round
    * lineage is cut with a lazy localCheckpoint so the plan stays flat.
    * A converged core is detectable (one more round changes nothing) but
    * not silently iterated to — unbounded fixpoint loops are the
    * does-not-survive-a-pathological-input shape. */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k and rounds must be >= 1")
    var e = edges.toDF("eu", "ev")
      .filter(col("eu") =!= col("ev"))
      .select(least(col("eu"), col("ev")).as("u"),
        greatest(col("eu"), col("ev")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("u").as("node")).unionAll(ed.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("node")
      e = e
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint(eager = false)
    }
    degrees(e)
  }
}
