package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-gram shingles as ONE per-row expression —
  * value-identical (elements AND first-occurrence order) to the
  * array-lambda form kept as
  * the test-only `graft.functions.LambdaReference.shinglesLambda` and to the DuckDB
  * shingle CTEs the dedup oracles run.
  *
  * WHY (the [[WinnowFingerprints]] rationale): `transform` +
  * `array_distinct` have no codegen — every gram pays interpreted eval
  * with boxed elements, and this column sits on the HOT paths of the
  * whole shingle-dedup family (prefix-filter sets, Jaccard refine,
  * containment, MinHash-estimate) AND the quality-features repetition
  * ratio (`size(shingles)/(n_tok−1)`) that the rule gate, the trained
  * classifier, and the model-serve path all evaluate per document.
  * Measured at sf0.1: the shingle-set materialization alone dropped
  * ~2.6 s → ~0.2 s.
  *
  * Contract pinned to the lambda form: split on single spaces with
  * trailing empties kept; fewer than k tokens (and NULL text) → EMPTY
  * array, never null; duplicates collapse to the first occurrence.
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "shingle k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_set expects a string column, got ${child.dataType}")

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty
    val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return empty
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val g = sb.toString
      if (seen.add(g)) out += UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
