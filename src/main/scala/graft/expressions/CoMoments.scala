package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact integer co-moment aggregate over an `array<long>` column (vectors
  * pre-scaled to fixed-point longs by the caller): ONE pass accumulates
  * everything a covariance needs — the row count, the d elementwise sums,
  * and the d² outer-product sums — as a single `1 + d + d²` long buffer.
  * `cov_ij ∝ n·P_ij − S_i·S_j` then derives from the output array with pure
  * integer arithmetic, so two engines that walk the same longs produce the
  * same covariance BIT-FOR-BIT (the tx_zipf scaled-long regression contract,
  * lifted from a scalar to a matrix).
  *
  * Same distributed shape as [[VectorSum]]: map-side partial buffers per
  * task (ObjectHashAggregate), k buffers of `1 + d + d²` longs on the wire,
  * elementwise merge — the corpus is touched once and nothing row-sized
  * shuffles. The explode-and-self-join formulation this replaces fans every
  * row out ×d² before aggregating; at 100 TB that is the difference between
  * one scan and a 4096× write amplification.
  *
  * Overflow budget (caller contract): with elements ≤ m after scaling,
  * P_ij grows ≤ n·m² and the downstream `n·P − S·S` needs n²·m² < 2⁶³ —
  * at m = 4·10³ (unit-ish floats at 1e3 scale) that holds to n ≈ 7·10⁸
  * vectors per aggregation scope; beyond that, shard the aggregate (it
  * merges) and widen to decimal at the combine step.
  *
  * Rows whose array is null or not exactly `dim` long are skipped and do
  * not count toward n (the VectorSum malformed-row rule).
  */
case class CoMoments(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be > 0")

  private val len = 1 + dim + dim * dim

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "co_moments"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"co_moments expects array<long> (pre-scaled fixed-point), got $t")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim && !(0 until dim).exists(arr.isNullAt)) {
        buffer(0) += 1L
        val x = new Array[Long](dim)
        var i = 0
        while (i < dim) { x(i) = arr.getLong(i); buffer(1 + i) += x(i); i += 1 }
        i = 0
        while (i < dim) {
          var j = 0
          val base = 1 + dim + i * dim
          while (j < dim) { buffer(base + j) += x(i) * x(j); j += 1 }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * java.lang.Long.BYTES)
    var i = 0
    while (i < len) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](len)
    var i = 0
    while (i < len) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CoMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CoMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
