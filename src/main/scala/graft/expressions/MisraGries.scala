package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch over a string column: a MERGEABLE
  * frequent-items summary with at most `capacity` counters, the candidate
  * pass of the two-pass exact heavy-hitters pattern (sketch candidates with
  * no keyed shuffle, then exact-count only the candidates).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012):
  *   - every item with true frequency > N / (capacity + 1) is present in the
  *     output (no heavy hitter is ever lost), where N is the total number of
  *     non-null rows aggregated;
  *   - each emitted `lb` is a lower bound on the item's true count, and
  *     true − lb ≤ N / (capacity + 1);
  *   - merging two sketches preserves both bounds (pointwise add, then
  *     subtract the (capacity+1)-th largest count from every counter and
  *     drop the non-positive ones), so the map-side partial / final-merge
  *     split Spark applies is exactly the algorithm's own composition.
  *
  * Distributed shape: one ObjectHashAggregate with per-task partial buffers
  * of ≤ capacity counters — the corpus itself never shuffles, only
  * `numPartitions` sketches of bounded size. That is the whole point versus
  * `groupBy(token)`: at 100 TB a full-key shuffle moves the corpus; this
  * moves kilobytes per task. Update cost is amortized O(1) per row (each
  * decrement sweep consumes `capacity` prior increments).
  *
  * Output: `array<struct<token string, lb bigint>>` sorted by (lb desc,
  * token) — deterministic regardless of hash-map iteration order.
  */
case class MisraGries(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries expects string, got $t")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UnsafeRow-backed UTF8String
      val key = v.asInstanceOf[UTF8String].toString
      buffer.get(key) match {
        case Some(c) => buffer(key) = c + 1
        case None if buffer.size < capacity => buffer(key) = 1L
        case None =>
          // classic MG step: decrement every counter, drop the zeros —
          // O(capacity) per sweep, amortized O(1) per row
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.mapValuesInPlace((_, c) => c - 1)
          buffer.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buffer(k) = buffer.getOrElse(k, 0L) + c }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything; at most
      // `capacity` counters stay strictly positive
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val vstar = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.mapValuesInPlace((_, c) => c - vstar)
      buffer.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      out(new String(kb, StandardCharsets.UTF_8)) = bb.getLong()
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
