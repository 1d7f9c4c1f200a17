package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TEST-ONLY differential references: the original array-lambda
  * formulations of [[graft.expressions.ShingleSet]] and
  * [[graft.expressions.WinnowFingerprints]], kept so the specs can pin
  * the native expressions element-for-element against an independent
  * derivation. Deliberately OUT of main (round-14 directive): Spark's
  * higher-order array functions have no codegen, so these forms pay
  * interpreted per-gram md5 + per-window slice allocation — measured
  * ~10× the native expressions at sf0.1 — and nothing in `queries/`
  * must be able to reach for them.
  */
object LambdaReference {

  /** Lambda form of [[TextFunctions.shingles]] /
    * [[graft.expressions.ShingleSet]]: distinct word k-gram shingles via
    * `transform(sequence(...))`. */
  def shinglesLambda(c: Column, k: Int = 2): Column = {
    val parts = TextFunctions.tokens(c)
    val grams = transform(
      sequence(lit(0), size(parts) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(parts, i + j + 1)): _*))
    when(size(parts) >= k, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Lambda form of [[TextFunctions.winnowFingerprints]] /
    * [[graft.expressions.WinnowFingerprints]]: word-gram 16-bit hashes
    * (first 4 md5 hex chars), distinct per-window minima. */
  def winnowFingerprintsLambda(c: Column, gramK: Int = 3,
      window: Int = 4): Column = {
    val parts = TextFunctions.tokens(c)
    val grams = when(size(parts) >= gramK,
      transform(sequence(lit(1), size(parts) - (gramK - 1)), i =>
        concat_ws(" ", (0 until gramK).map(o => element_at(parts, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    val hashes = transform(grams, g =>
      conv(substring(md5(g), 1, 4), 16, 10).cast("long"))
    when(size(hashes) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(lit(1), size(hashes) - (window - 1))), j =>
          array_min(slice(hashes, j, lit(window))))))
      .otherwise(array().cast("array<long>"))
  }
}
