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
