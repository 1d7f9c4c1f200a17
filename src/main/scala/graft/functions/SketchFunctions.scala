package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Column wrappers + estimators for the mergeable set sketches
  * ([[graft.expressions.KmvSketch]]). The sketch is built by ONE bounded
  * aggregate; every estimator below is pure array arithmetic over the
  * resulting `array<bigint>` columns — combining two groups' sketches into
  * an overlap estimate never touches the raw data again.
  */
object SketchFunctions {

  /** KMV theta sketch of the distinct values of `c` (k smallest seeded
    * xxhash64 positions, ascending; see [[graft.expressions.KmvSketch]]).
    * No upstream `distinct` needed — duplicates collapse in the buffer. */
  def kmvSketch(c: Column, k: Int): Column =
    GraftBridge.column(
      graft.expressions.KmvSketch(GraftBridge.expression(c), k)
        .toAggregateExpression())

  /** Unsigned fraction of a sketch position: maps the sign-flipped long
    * back to its place in [0, 1). */
  private def frac(p: Column): Column =
    (p.cast("double") + 9.223372036854776e18) / 1.8446744073709552e19

  /** Distinct-count estimate from one sketch. Exact (= size) when the group
    * had fewer than k distinct values; (k−1)/frac(k-th min) otherwise. */
  def kmvDistinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1).cast("double") / frac(element_at(sketch, k)))

  /** Jaccard estimate between two sketches: the fraction of the k smallest
    * union positions present in BOTH sketches (Beyer et al. 2007). Exact
    * when both groups fit inside k. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val merged = array_sort(array_distinct(concat(a, b)))
    val kk = least(lit(k), size(merged))
    val kmin = slice(merged, lit(1), kk)
    size(array_intersect(array_intersect(kmin, a), b)).cast("double") /
      kk.cast("double")
  }

  /** Intersection-size estimate: Jaccard × estimated union size (the k-th
    * min of the merged sketch bounds the union). */
  def kmvIntersect(a: Column, b: Column, k: Int): Column = {
    val merged = array_sort(array_distinct(concat(a, b)))
    kmvJaccard(a, b, k) * kmvDistinct(slice(merged, lit(1), least(lit(k), size(merged))), k)
  }
}
