package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Intersection COUNT of two SORTED (ascending binary order, e.g.
  * `sort_array`) distinct string arrays, as one allocation-free merge
  * walk — the exact-similarity refine kernel.
  *
  * WHY: the shingle-dedup refine steps scored millions of candidate
  * pairs with `size(array_intersect(a, b)) / size(array_union(a, b))` —
  * per PAIR that builds a hash set AND materializes a union array, just
  * to take two sizes. For DISTINCT sets only the intersection count is
  * needed (|A∪B| = |A| + |B| − |A∩B|), and for SORTED arrays the count
  * is a single merge walk with zero allocation. Measured at sf0.1 this
  * + the sorted producer cut the dd_prefix_pairs refine by ~3×.
  *
  * Contract: BOTH inputs must be sorted ascending in UTF8String binary
  * order with no duplicates and no nulls — exactly what
  * `sort_array(ShingleSet(...))` produces; the differential spec pins
  * equality against `size(array_intersect(...))` on real corpus pairs.
  * Null if either input is null (the join-miss contract).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // containsNull = false is REQUIRED, not just documented: the merge
    // walk calls getUTF8String per element and a null element would NPE
    // mid-walk — reject at ANALYSIS instead (every producer is
    // `sort_array(ShingleSet(...))`-shaped, whose element type is
    // non-null by construction)
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two string arrays with " +
          s"containsNull = false, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
