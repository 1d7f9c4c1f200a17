package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE per-row expression:
  * `MinHashSignature(text, k, numHashes)` tokenizes on spaces, forms word
  * k-shingles, and returns the `numHashes` minima of md5("seed:" || shingle)
  * hex-encoded — value-identical to exploding
  * [[graft.functions.TextFunctions.shingles]] and aggregating with
  * [[MinHashSig]] (and to the DuckDB band CTE the oracles run), but with no
  * generator, no aggregate, and no per-shingle row materialization: the
  * signature pass becomes an embarrassingly parallel projection, the ideal
  * 100 TB shape (dedup state never leaves the row until the tiny
  * (doc_id, band_key) projection shuffles).
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

  private val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(i => s"$i:".getBytes("UTF-8")).toArray

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

  override protected def nullSafeEval(input: Any): Any = {
    // identical token semantics to functions.split(c, " "): split with
    // limit -1 keeps trailing empty tokens
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < shingleK) return null
    val mins = new Array[Array[Byte]](numHashes)
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
      val shingleBytes = sb.toString.getBytes("UTF-8")
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(seedPrefixes(i))
        md.update(shingleBytes)
        val h = md.digest()
        if (mins(i) == null || less(h, mins(i))) mins(i) = h
        i += 1
      }
      s += 1
    }
    val hex = "0123456789abcdef"
    val arr = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      val h = mins(j)
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
