package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  // 60 deterministic 8-dim vectors on a ring: cos/sin harmonics make the
  // true neighbor structure the id-adjacent vectors — easy to audit.
  private def vecs = (0 until 60).map { i =>
    val a = i * 2.0 * math.Pi / 60.0
    (i.toLong, Array(math.cos(a), math.sin(a), math.cos(2 * a),
      math.sin(2 * a), math.cos(3 * a), math.sin(3 * a), 1.0, 0.5)
      .map(_.toFloat))
  }.toDF("vec_id", "embedding")

  test("knnGraph: deterministic, self-free, at most k edges per node") {
    val g1 = rowSet(NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
      k = 4, iters = 2, revCap = 4))
    val g2 = rowSet(NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
      k = 4, iters = 2, revCap = 4))
    assert(g1 == g2, "same corpus must yield the identical graph")
    val g = NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
      k = 4, iters = 2, revCap = 4)
    assert(g.filter(col("src") === col("dst")).count() == 0L)
    val maxDeg = g.groupBy("src").count().agg(max("count")).head.getLong(0)
    assert(maxDeg <= 4L)
    assert(g.select("src").distinct().count() == 60L,
      "every node must carry a neighbor list")
  }

  test("array-collapsed candidate generation matches the self-join " +
      "reference round for round (round-15 internals change)") {
    // the pre-round-15 refineRound, verbatim: rev window, gen = distinct
    // union, pairs = gen ⋈ gen on src with a.dst < b.dst, score, compete
    // via distinct() + top-k window. The production round replaced the
    // self-join with a per-src sorted-array explosion and the
    // distinct+window pair of exchanges with one repartition —
    // this reference pins that every trajectory step is IDENTICAL.
    def referenceRound(knn: org.apache.spark.sql.DataFrame, k: Int,
        revCap: Int): org.apache.spark.sql.DataFrame = {
      val e = vecs.select(col("vec_id"), col("embedding").as("v"))
      def score(pairs: org.apache.spark.sql.DataFrame) = pairs
        .join(e.select(col("vec_id").as("src"), col("v").as("va")), "src")
        .join(e.select(col("vec_id").as("dst"), col("v").as("vb")), "dst")
        .select(col("src"), col("dst"),
          graft.functions.VectorFunctions
            .cosineRounded(col("va"), col("vb")).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("sim").desc, col("dst"))
      val rev = knn
        .select(col("dst").as("src"), col("src").as("dst"), col("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= revCap).drop("rn")
      val gen = knn.select("src", "dst")
        .unionByName(rev.select("src", "dst")).distinct()
      val pairs = gen.as("a")
        .join(gen.as("b"),
          col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .select(col("a.dst").as("src"), col("b.dst").as("dst"))
        .distinct()
      val scored = score(pairs)
      val cand = scored.unionByName(
        scored.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
      knn.unionByName(cand)
        .filter(col("src") =!= col("dst"))
        .distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
    }
    var ref = NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
      k = 4, iters = 0, revCap = 4) // shared init (iters=0 = seed scoring)
    for (it <- 1 to 3) {
      ref = referenceRound(ref, k = 4, revCap = 4).localCheckpoint()
      val got = rowSet(NnDescent.knnGraph(vecs, col("vec_id"),
        col("embedding"), k = 4, iters = it, revCap = 4))
      assert(got == rowSet(ref), s"trajectories diverged at iteration $it")
    }
  }

  test("descent: each iteration only improves per-node neighbor quality " +
      "and converges to the exact k-NN graph on the ring") {
    def meanSim(iters: Int): Double =
      NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
        k = 4, iters = iters, revCap = 4)
        .agg(avg("sim")).head.getDouble(0)
    val m1 = meanSim(1)
    val m2 = meanSim(2)
    val m3 = meanSim(3)
    assert(m1 <= m2 && m2 <= m3,
      s"mean neighbor similarity must be non-decreasing: $m1, $m2, $m3")
    // on the ring manifold the true 4-NN of i are i±1, i±2 — after enough
    // rounds the local join must find exactly them (full convergence)
    val got = NnDescent.knnGraph(vecs, col("vec_id"), col("embedding"),
        k = 4, iters = 4, revCap = 4)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 60L).flatMap(i => Seq(
      i -> ((i + 1) % 60), i -> ((i + 59) % 60),
      i -> ((i + 2) % 60), i -> ((i + 58) % 60))).toSet
    assert(got == want, "must converge to the exact ring k-NN graph")
  }
}
