package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector sum aggregate over an `array<float|double>` column:
  * ONE aggregate whose buffer is a fixed-length `Array[Double]`, instead of
  * `dim` separate `sum(element_at(...))` columns. The per-dimension-columns
  * form drops out of whole-stage codegen above `spark.sql.codegen.maxFields`
  * (100) — i.e. at every real embedding dim — and evaluates `dim`
  * interpreted projections per row; this is a single tight loop.
  *
  * Same distributed shape as the built-in sum: map-side partial buffers per
  * task (ObjectHashAggregate), k buffers of `dim` doubles on the wire,
  * elementwise merge. Rows whose array is null or not exactly `dim` long
  * are skipped (a length-mismatched vector cannot contribute a meaningful
  * elementwise sum).
  *
  * Mean-vector callers MUST pair this with a divisor that counts the same
  * rows — `count(when(size(v) === dim, 1))`, NOT `count(*)` — otherwise a
  * skipped malformed row still inflates the divisor and biases the mean
  * toward zero instead of being excluded consistently.
  */
case class VectorSum(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, "dim must be > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  // lazy: the child is unresolved at construction (built from a Column)
  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum expects array<float|double>, got $t")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        var i = 0
        while (i < dim) {
          if (!arr.isNullAt(i)) {
            buffer(i) += (if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
          }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dim * java.lang.Double.BYTES)
    var i = 0
    while (i < dim) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
