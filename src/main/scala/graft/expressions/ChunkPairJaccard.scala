package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The prefix-join refine SCREEN, one CHUNK PAIR per evaluation: given
  * two doc-id-sorted chunks of prefix items — struct(doc_id, n, rn, shh)
  * with `shh` the doc's SORTED 64-bit shingle-hash array — and the
  * diagonal flag (same chunk), emit (doc_a, doc_b) for every item pair
  * that passes the length band, the PPJoin positional filter, and a
  * merge-walk Jaccard-at-threshold test over the HASH arrays, all inside
  * one tight JVM loop.
  *
  * WHY an expression (round-14 sf1 rehearsal): at the sf1 fixture
  * (t = 0.5, entropy-bounded vocab) the prefix filter admits 447M
  * candidate pairs — 36% of ALL doc pairs. Every formulation that
  * surfaces those pairs as ROWS pays for them: the candidates-then-
  * attach join shuffled ~450 GB of array payload (~400 s), a generator
  * fusion copies the partner chunk's megabyte array into every emitted
  * row (allocation-rate OOM, measured), and an interpreted per-pair
  * STRING merge walk pays UTF8String allocation + memcmp per step
  * (~665 s, measured). Here the quadratic mass exists only as loop
  * iterations over primitive long arrays (~10× cheaper per step, zero
  * allocation), and only screen survivors — output-sized — materialize.
  *
  * LOSSLESS screen, not the final answer: 64-bit hashing can only merge
  * distinct shingles, so the hash-walk intersection count is ≥ the true
  * string count and the hash Jaccard ≥ the true Jaccard — no qualifying
  * pair is ever dropped (the ~2⁻⁶⁴-rate false admits cost one extra row
  * in the exact string-walk CONFIRM join the caller runs on the
  * survivors). The walk also carries a conservative early exit: bail
  * once even a full-overlap tail cannot reach the threshold.
  *
  * Inputs must be doc-id-sorted with doc_id leading the struct
  * (sort_array order), so every emitted pair has doc_a < doc_b: the
  * diagonal walks j > i, and in a cross pair every left-chunk id
  * precedes every right-chunk id. Filter semantics match the Column
  * forms they replace, and EVERY threshold comparison carries the same
  * one-sided 1e-9 fp guard as ceilT: band `max·t − 1e-9 ≤ min`,
  * positional `1 + min(na−ra, nb−rb) ≥ ⌈t·max − 1e-9⌉`, early-exit
  * bail only when clearly below `t·(na+nb) − 1e-9`. A double product
  * can round ABOVE its rational value (10·0.9 = 9.000000000000002;
  * 9·1.9 = 17.099999999999998 < 0.9·19 = 17.1), which without the
  * guard rejects pairs whose true jaccard EQUALS the threshold —
  * caught by PrefixGuardSpec's boundary corpus in round 15. The slack
  * only admits candidates; the exact confirm removes false admits.
  */
case class ChunkPairJaccard(first: Expression, second: Expression,
    third: Expression, threshold: Double)
    extends TernaryExpression with CodegenFallback {

  private val outStruct = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def chunkOk(dt: DataType): Boolean = dt match {
      case ArrayType(StructType(fields), _) =>
        fields.length == 4 &&
          fields(0).dataType == LongType &&
          fields(1).dataType == IntegerType &&
          fields(2).dataType == IntegerType &&
          (fields(3).dataType match {
            case ArrayType(LongType, false) => true
            case _ => false
          })
      case _ => false
    }
    if (chunkOk(first.dataType) && chunkOk(second.dataType) &&
        third.dataType == BooleanType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "chunk_pair_jaccard expects two array<struct<long, int, int, " +
          s"array<long> (no nulls)>> chunks and a boolean, got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  /** Merge-walk multiset-intersection count over sorted long arrays with
    * the conservative can't-reach-threshold early exit. Returns -1 on
    * bail (callers only test `>= required`, and -1 < any required). */
  private def screenCount(a: ArrayData, b: ArrayData, tSum: Double): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      // even matching EVERY remaining element cannot reach the
      // threshold: maxAch·(1+t) < t·(na+nb) ⇒ bail — only when CLEARLY
      // below (one-sided 1e-9 guard): at rational equality the fp
      // products can straddle (9·1.9 < 0.9·19 in doubles) and an
      // unguarded bail drops a true boundary pair
      val maxAch = n + math.min(na - i, nb - j)
      if (maxAch * (1.0 + threshold) < tSum - 1e-9) return -1L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def nullSafeEval(l: Any, r: Any, d: Any): Any = {
    val ba = l.asInstanceOf[ArrayData]
    val bb = r.asInstanceOf[ArrayData]
    val diagonal = d.asInstanceOf[Boolean]
    val nA = ba.numElements()
    val nB = bb.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < nA) {
      val a = ba.getStruct(i, 4)
      val idA = a.getLong(0)
      val na = a.getInt(1)
      val ra = a.getInt(2)
      val shA = a.getArray(3)
      var j = if (diagonal) i + 1 else 0
      while (j < nB) {
        val b = bb.getStruct(j, 4)
        val nb = b.getInt(1)
        // length band: the same guarded double product as the Column form
        val mx = if (na > nb) na else nb
        val mn = if (na > nb) nb else na
        if (mx * threshold - 1e-9 <= mn) {
          val rb = b.getInt(2)
          // positional filter with the shared one-sided fp guard
          val reach = 1L + math.min(na - ra, nb - rb).toLong
          if (reach >= math.ceil(threshold * mx - 1e-9).toLong) {
            val ic = screenCount(shA, b.getArray(3),
              threshold * (na.toDouble + nb.toDouble))
            if (ic >= 0 &&
                ic.toDouble / (na.toLong + nb.toLong - ic).toDouble
                  >= threshold)
              out += InternalRow(idA, b.getLong(0))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
