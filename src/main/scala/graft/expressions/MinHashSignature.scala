package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE per-row expression:
  * `MinHashSignature(text, k, numHashes)` tokenizes on spaces, forms word
  * k-shingles, and returns `numHashes` minima over the shingle set —
  * value-identical to exploding
  * [[graft.functions.TextFunctions.shingles]] and aggregating with
  * [[MinHashSig]] (and to the DuckDB band CTE the oracles run), but with no
  * generator, no aggregate, and no per-shingle row materialization: the
  * signature pass becomes an embarrassingly parallel projection, the ideal
  * 100 TB shape (dedup state never leaves the row until the tiny
  * (doc_id, band_key) projection shuffles).
  *
  * Hash family (shared with [[MinHashSig]] and the oracle CTEs): component
  * `i` is the 8-hex-char chunk `i % 4` of md5 stream `i / 4`, where stream 0
  * is `md5(shingle)` and stream `t > 0` is `md5("t:" || shingle)` — the same
  * stream convention as the 64-bit SimHash. One md5 call yields FOUR
  * independent uniform 32-bit components, so a 16-hash signature costs 4
  * digests per shingle instead of 16; min over equal-length lowercase-hex
  * strings is min over the 32-bit values. A 32-bit component range is ample
  * for min-wise hashing: a spurious shared minimum between two documents
  * needs an md5-chunk collision at the min itself (~|A∪B| / 2^32 per
  * component), and LSH candidates are Jaccard-refined downstream anyway.
  *
  * Null (⇒ no LSH bands, the "cannot near-dup" contract) for null text and
  * for documents shorter than k words. Duplicate shingles need no dedup:
  * minima over a multiset equal minima over its set.
  */
case class MinHashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects a string column, got ${child.dataType}")

  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val numStreams: Int = (numHashes + 3) / 4

  // stream 0 is unprefixed; stream t hashes "t:" || shingle
  private val streamPrefixes: Array[Array[Byte]] =
    (0 until numStreams).map(t =>
      if (t == 0) Array.emptyByteArray else s"$t:".getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any = {
    // identical token semantics to functions.split(c, " "): split with
    // limit -1 keeps trailing empty tokens
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < shingleK) return null
    // per-component 4-byte minima, packed as ints (unsigned compare)
    val mins = new Array[Int](numHashes)
    java.util.Arrays.fill(mins, -1) // 0xffffffff = unsigned max
    var seen = false
    val md = digests.get()
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s <= words.length - shingleK) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(words(s + j))
        j += 1
      }
      seen = true
      val shingleBytes = sb.toString.getBytes("UTF-8")
      var t = 0
      while (t < numStreams) {
        md.reset()
        if (streamPrefixes(t).length > 0) md.update(streamPrefixes(t))
        md.update(shingleBytes)
        val h = md.digest()
        var c = 0
        val lim = math.min(4, numHashes - t * 4)
        while (c < lim) {
          val v = ((h(4 * c) & 0xff) << 24) | ((h(4 * c + 1) & 0xff) << 16) |
            ((h(4 * c + 2) & 0xff) << 8) | (h(4 * c + 3) & 0xff)
          val i = t * 4 + c
          if (java.lang.Integer.compareUnsigned(v, mins(i)) < 0) mins(i) = v
          c += 1
        }
        t += 1
      }
      s += 1
    }
    if (!seen) return null
    val hex = "0123456789abcdef"
    val arr = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      val v = mins(j)
      val out = new Array[Byte](8)
      var i = 0
      while (i < 8) {
        out(i) = hex.charAt((v >>> (28 - 4 * i)) & 0xf).toByte
        i += 1
      }
      arr(j) = UTF8String.fromBytes(out)
      j += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
