package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single custom `TypedImperativeAggregate`:
  * `graft_minhash_sig(shingle, numHashes)` over a doc's exploded shingles
  * returns the array of `numHashes` minima of md5("seed:" || shingle),
  * hex-encoded — component-for-component identical to `numHashes` separate
  * `min(md5(concat(...)))` aggregates (and to the DuckDB oracle), but in ONE
  * buffer with a reused MessageDigest and raw 16-byte comparisons instead of
  * 16 string-building aggregation paths.
  *
  * Scale: the buffer is numHashes × 16 bytes per group; partial aggregation
  * collapses shingles map-side, so only one small signature row per doc
  * crosses the shuffle.
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // one digest per JVM thread: aggregate instances can be shared across
  // concurrently-running local tasks
  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(i => s"$i:".getBytes("UTF-8")).toArray

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](numHashes)

  /** Unsigned lexicographic compare — the same order as comparing the
    * lowercase-hex encodings as strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def update(buf: Array[Array[Byte]], row: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(row)
    if (v != null) {
      val shingle = v.asInstanceOf[UTF8String].getBytes
      val md = digests.get()
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(seedPrefixes(i))
        md.update(shingle)
        val h = md.digest()
        if (buf(i) == null || less(h, buf(i))) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && less(b(i), a(i)))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    if (buf(0) == null) null
    else {
      val hex = "0123456789abcdef"
      val arr = new Array[Any](numHashes)
      var j = 0
      while (j < numHashes) {
        val h = buf(j)
        val out = new Array[Byte](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = hex.charAt((h(i) >> 4) & 0xf).toByte
          out(2 * i + 1) = hex.charAt(h(i) & 0xf).toByte
          i += 1
        }
        arr(j) = UTF8String.fromBytes(out)
        j += 1
      }
      new GenericArrayData(arr)
    }

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](numHashes * 17)
    var i = 0
    while (i < numHashes) {
      if (buf(i) != null) {
        out(i * 17) = 1
        System.arraycopy(buf(i), 0, out, i * 17 + 1, 16)
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < numHashes) {
      if (bytes(i * 17) == 1) {
        val h = new Array[Byte](16)
        System.arraycopy(bytes, i * 17 + 1, h, 0, 16)
        buf(i) = h
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
