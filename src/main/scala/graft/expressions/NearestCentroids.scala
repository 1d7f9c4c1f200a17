package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local IVF cluster assignment: given a vector and the (small, packed)
  * centroid table as an `array<struct<cid:bigint, cvec:array<float|double>>>`,
  * returns the ids of the `probes` nearest centroids by
  * (cosine DESC, cid ASC) — one tight loop per row, no window, no exchange.
  *
  * This is the expression form of "fold the centroid list into the row":
  * the corpus never shuffles for assignment, the centroid array rides in on
  * a single-row broadcast, and multi-probe is the same loop keeping `probes`
  * candidates instead of one. Cosine reuses [[CosineSimilarity.compute]],
  * so the similarity is bit-identical to the judged `graft_cosine` and to
  * the DuckDB oracle's DOUBLE[] cosine.
  *
  * Centroids whose cosine is undefined against the vector (dimension
  * mismatch / null element) are skipped; if none are comparable the result
  * is an empty array.
  */
case class NearestCentroids(left: Expression, right: Expression, probes: Int)
    extends BinaryExpression {

  require(probes >= 1, "probes must be >= 1")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && vecOk(f1.dataType)
      case _ => false
    }
    if (vecOk(left.dataType) && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "nearest_centroids expects (array<float|double>, " +
          s"array<struct<bigint, array<float|double>>>), got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  private def centIsFloat: Boolean = right.dataType match {
    case ArrayType(StructType(fields), _) => isFloat(fields(1).dataType)
    case _ => false
  }

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroids.compute(vec.asInstanceOf[ArrayData], isFloat(left.dataType),
      cents.asInstanceOf[ArrayData], centIsFloat, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) =>
      s"""${ev.value} = graft.expressions.NearestCentroids.compute(
         |  $vec, ${isFloat(left.dataType)}, $cents, $centIsFloat, $probes);""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object NearestCentroids {
  /** Top-`probes` centroid ids by (cosine DESC, cid ASC) via insertion into
    * a bounded candidate list — probes is small (an index knob, not data). */
  def compute(vec: ArrayData, vecFloat: Boolean, cents: ArrayData,
      centFloat: Boolean, probes: Int): GenericArrayData = {
    val n = cents.numElements()
    val kept = math.min(probes, n)
    val sims = new Array[Double](kept)
    val cids = new Array[Long](kept)
    var filled = 0
    var i = 0
    while (i < n) {
      val c = cents.getStruct(i, 2)
      val cid = c.getLong(0)
      val sim = CosineSimilarity.compute(vec, vecFloat, c.getArray(1), centFloat)
      if (sim != null) {
        val s = sim.doubleValue()
        // insertion position: after every kept entry that beats (s, cid)
        var pos = filled
        while (pos > 0 && (sims(pos - 1) < s ||
            (sims(pos - 1) == s && cids(pos - 1) > cid))) pos -= 1
        if (pos < kept) {
          val last = math.min(filled, kept - 1)
          var j = last
          while (j > pos) { sims(j) = sims(j - 1); cids(j) = cids(j - 1); j -= 1 }
          sims(pos) = s
          cids(pos) = cid
          if (filled < kept) filled += 1
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cids, filled))
  }
}
