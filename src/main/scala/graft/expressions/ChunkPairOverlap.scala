package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The winnow-pair overlap counter, one CHUNK PAIR per evaluation — the
  * [[ChunkPairJaccard]] pattern applied to `dd_winnow_pairs` (round-16
  * directive #1: the query was candidate-bound at sf1, 5.99 s / slope
  * 7.08): given two doc-id-sorted chunks of struct(doc_id, fps) items —
  * `fps` the doc's SORTED DISTINCT winnow-fingerprint array — the
  * diagonal flag, and the unit's bucket fingerprint, emit
  * (doc_a, doc_b, n_shared) for every item pair whose MINIMUM shared
  * fingerprint equals the bucket key and whose shared-fingerprint count
  * reaches `minShared`, all inside one tight JVM loop over primitive
  * longs.
  *
  * WHY: the old formulation emitted one ROW per shared-fingerprint
  * co-occurrence (Σ_bucket C(occupancy, 2) rows — 10⁷-scale at the sf1
  * fixture whose 30-word vocabulary makes every fingerprint hot), then
  * shuffled that quadratic mass into a pair-keyed count aggregate that
  * built a hash table with one group per CANDIDATE pair only to discard
  * nearly all of them at `n_shared >= minShared`. Here the quadratic
  * mass exists only as merge-walk iterations; nothing pair-shaped ever
  * crosses a shuffle or enters an aggregate — output-sized rows only.
  *
  * EXACTLY-ONCE emission without a distinct: a qualifying pair shares
  * the fingerprint set S and therefore co-occurs in |S| buckets; the
  * walk emits it only from the bucket holding min(S), so each pair
  * materializes exactly once, already carrying its exact n_shared = |S|
  * (per-doc fingerprints are DISTINCT by [[WinnowFingerprints]]'
  * contract, so the co-occurrence count the old groupBy computed IS the
  * intersection size). Within one bucket a pair meets in exactly one
  * (ci <= cj) chunk unit, so chunk splitting preserves the guarantee.
  *
  * Inputs must be doc-id-sorted with doc_id leading the struct
  * (sort_array order), so every emitted pair has doc_a < doc_b: the
  * diagonal walks j > i, and in a cross unit every left-chunk id
  * precedes every right-chunk id. The walk short-circuits twice: a pair
  * whose FIRST shared fingerprint is not the bucket key is abandoned at
  * that step (it belongs to an earlier bucket), and the count walk
  * bails once even a full-overlap tail cannot reach `minShared` (the
  * emitted n_shared is always the exact full-walk count — the bail only
  * skips pairs that cannot qualify).
  */
case class ChunkPairOverlap(ba: Expression, bb: Expression,
    diagonal: Expression, bucketFp: Expression, minShared: Int)
    extends Expression with CodegenFallback {
  require(minShared >= 1, "minShared must be positive")

  override def children: Seq[Expression] = Seq(ba, bb, diagonal, bucketFp)

  private val outStruct = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("n_shared", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def chunkOk(dt: DataType): Boolean = dt match {
      case ArrayType(StructType(fields), _) =>
        fields.length == 2 &&
          fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(LongType, false) => true
            case _ => false
          })
      case _ => false
    }
    if (chunkOk(ba.dataType) && chunkOk(bb.dataType) &&
        diagonal.dataType == BooleanType && bucketFp.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "chunk_pair_overlap expects two array<struct<long, array<long> " +
          s"(no nulls)>> chunks, a boolean and a long, got ${ba.dataType}" +
          s" / ${bb.dataType} / ${diagonal.dataType} / ${bucketFp.dataType}")
  }

  /** Merge-walk over two sorted distinct long arrays: returns the exact
    * intersection size when the minimum shared value equals `fp` AND the
    * count reaches `minShared`, else -1 (not this bucket's pair, or
    * cannot qualify). */
  private def sharedFromBucket(a: ArrayData, b: ArrayData, fp: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      // even matching every remaining element cannot reach minShared
      if (n + math.min(na - i, nb - j) < minShared) return -1L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        // the FIRST shared value decides ownership: emit only from the
        // bucket holding min(shared) — any other bucket abandons here
        if (n == 0L && x != fp) return -1L
        n += 1; i += 1; j += 1
      }
      else if (x < y) i += 1
      else j += 1
    }
    if (n >= minShared) n else -1L
  }

  override def eval(input: InternalRow): Any = {
    val l = ba.eval(input)
    val r = bb.eval(input)
    val d = diagonal.eval(input)
    val f = bucketFp.eval(input)
    if (l == null || r == null || d == null || f == null) return null
    val ca = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    val diag = d.asInstanceOf[Boolean]
    val fp = f.asInstanceOf[Long]
    val nA = ca.numElements()
    val nB = cb.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < nA) {
      val a = ca.getStruct(i, 2)
      val idA = a.getLong(0)
      val fpsA = a.getArray(1)
      var j = if (diag) i + 1 else 0
      while (j < nB) {
        val b = cb.getStruct(j, 2)
        val n = sharedFromBucket(fpsA, b.getArray(1), fp)
        if (n >= 0) out += InternalRow(idA, b.getLong(0), n)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ba = newChildren(0), bb = newChildren(1),
      diagonal = newChildren(2), bucketFp = newChildren(3))
}
