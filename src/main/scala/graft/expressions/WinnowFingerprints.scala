package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003) as ONE per-row expression: `WinnowFingerprints(text,
  * gramK, window)` tokenizes on spaces, hashes every word `gramK`-gram
  * (first 16 bits of md5 — the engine-portable hex fold the DuckDB
  * oracles mirror with `conv(substring(md5(g),1,4),16,10)`), and returns
  * the DISTINCT minima of every `window`-wide sliding window, in first-
  * occurrence order — value-identical to the
  * the test-only `graft.functions.LambdaReference.winnowFingerprintsLambda` column
  * form (spec-pinned differentially) and to the oracle CTEs.
  *
  * WHY an Expression when array lambdas express the same thing: Spark's
  * higher-order functions (`transform`, `slice`, `array_min`) have no
  * codegen — each gram's md5 runs through interpreted expression eval
  * with per-element boxing, and the window minima allocate a fresh
  * slice per position. Measured at sf0.1 the lambda fingerprint pass
  * alone cost ~14 s — MORE than the whole judged winnow-pair query
  * does with this expression (one tight JVM loop per row, the JDK's
  * intrinsified MessageDigest MD5 over byte spans in place, zero
  * per-window allocation). Same preference
  * order as [[MinHashSignature]]/[[GearChunker]]: native `Expression`
  * over lambda chains over UDFs for the 100 TB row-local hot path.
  *
  * Semantics pinned to the lambda form: split on single spaces with
  * trailing empties kept; docs with fewer than `gramK` tokens (and NULL
  * text) yield an EMPTY array, never null; when the gram count is
  * positive but below `window`, the single window is the whole hash
  * list (the `greatest(1, n−w+1)`/truncated-slice rule).
  */
case class WinnowFingerprints(child: Expression, gramK: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramK >= 1 && window >= 1, "gramK and window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects a string column, got ${child.dataType}")

  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return empty // the lambda form's null-text contract
    // zero-copy byte walk (round 15, the [[MinHashSignature]] rewrite):
    // split(" ", -1) semantics are exact on raw UTF-8 bytes (0x20 never
    // occurs inside a multi-byte sequence) and a gram joined with ' ' IS
    // the original byte span from word i to word i+gramK−1, so no gram
    // string is ever built; MessageDigest digests the span in place.
    // Assumes well-formed UTF-8 input (the parquet string contract): the
    // old toString path replaced malformed sequences with U+FFFD before
    // hashing, so only on invalid bytes could the two forms differ
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var nWords = 1
    var p = 0
    while (p < n) { if (bytes(p) == ' '.toByte) nWords += 1; p += 1 }
    val nGrams = nWords - gramK + 1
    if (nGrams <= 0) return empty
    val starts = new Array[Int](nWords + 1)
    var ww = 1
    p = 0
    while (p < n) {
      if (bytes(p) == ' '.toByte) { starts(ww) = p + 1; ww += 1 }
      p += 1
    }
    starts(nWords) = n + 1 // sentinel: end(w) = starts(w+1) − 1
    // gram hashes: first 2 md5 digest bytes as an unsigned 16-bit long.
    // MessageDigest, deliberately — see [[MinHashSignature]]: a hand
    // one-block MD5 measured slower than the JDK's intrinsified one
    val md = digests.get()
    val h = new Array[Byte](16)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val off = starts(i)
      md.reset()
      md.update(bytes, off, starts(i + gramK) - 1 - off)
      try md.digest(h, 0, 16)
      catch { case e: java.security.DigestException =>
        throw new IllegalStateException(e) }
      hashes(i) = (((h(0) & 0xff) << 8) | (h(1) & 0xff)).toLong
      i += 1
    }
    // distinct sliding-window minima, first-occurrence order
    val nWin = if (nGrams >= window) nGrams - window + 1 else 1
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](nWin)
    var w = 0
    while (w < nWin) {
      var m = hashes(w)
      var k = w + 1
      val lim = math.min(w + window, nGrams)
      while (k < lim) {
        if (hashes(k) < m) m = hashes(k)
        k += 1
      }
      if (seen.add(m)) out += m
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
