package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) theta sketch over a key column: the `k` smallest
  * xxhash64 values of the distinct keys — a MERGEABLE bounded summary that,
  * unlike HLL, supports SET OPERATIONS between sketches: two groups'
  * sketches combine into distinct-count, union, intersection, and Jaccard
  * estimates with relative error ~1/sqrt(k) (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007;
  * Dasgupta et al.'s theta-sketch framework generalizes the same idea).
  * That is the audience-overlap / split-overlap question every corpus and
  * event pipeline asks ("how many users does segment A share with B") at a
  * cost HLL structurally cannot pay.
  *
  * Distributed shape: one ObjectHashAggregate whose partial buffers hold
  * ≤ k longs — the corpus never shuffles and duplicates collapse INSIDE the
  * buffer (a min-hash set is a set summary; no upstream `distinct` pass is
  * needed), so the sketch build over 100 TB of raw events moves kilobytes
  * per task. Merge = set-union + re-trim to k, associative and
  * partitioning-invariant, so the result is bit-identical on any cluster
  * layout (no randomness: the hash is seeded xxhash64).
  *
  * Output: `array<bigint>` of the k smallest hash POSITIONS in ascending
  * order, where position = hash ^ Long.MinValue (the sign-bit flip maps
  * unsigned hash order onto signed long order, so plain `array_sort` /
  * `<` comparisons downstream see unsigned order). The unsigned fraction of
  * position `p` is `(p + 2^63) / 2^64`; the standard estimators follow:
  *   - distinct(A)  ≈ (k-1) / frac(a_k)          (k-th smallest of A)
  *   - jaccard(A,B) ≈ |kmin_k(A ∪ B) ∩ A ∩ B| / k'  (k' = min(k, |A ∪ B|))
  * Sketches with fewer than k entries are EXACT (every distinct hash is
  * present), so small groups pay no error at all.
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be > 0")

  private val seed = 42L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects bigint/int/string, got $t")
  }

  /** Buffer = the k smallest positions seen, as a sorted set (dedup is the
    * set property that makes the sketch distinct-aware). */
  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def position(v: Any): Long = {
    val h = v match {
      case l: Long => XXH64.hashLong(l, seed)
      case i: Int => XXH64.hashLong(i.toLong, seed)
      case s: UTF8String =>
        // hashed immediately, not retained — no defensive copy needed
        val b = s.getBytes
        XXH64.hashUnsafeBytes(b,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)
    }
    h ^ Long.MinValue
  }

  private def add(buffer: mutable.TreeSet[Long], p: Long): Unit =
    if (buffer.size < k) buffer += p
    else if (p < buffer.last) { buffer += p; if (buffer.size > k) buffer -= buffer.last }

  override def update(buffer: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, position(v))
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { out += bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
