package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunk boundaries (the FastCDC gear,
  * Xia et al. USENIX ATC 2016) as a native codegen'd expression — the
  * PRODUCTION boundary scan behind the dd_cdc_chunks semantics: where the
  * judged window-md5 predicate pays one md5 per position, the gear hash is
  * one table lookup, one shift and one add per character, O(len) with no
  * hashing at all — the only CDC form that survives a 100 TB payload scan.
  *
  * Definition (the judged cross-engine contract — `dd_cdc_gear`'s DuckDB
  * oracle reconstructs exactly this): over the characters c₁..cₙ of the
  * string (BMP code points; the gear table is indexed by code point mod
  * 256),
  *
  *   h₀ = 0,   hᵢ = (hᵢ₋₁ << 1) + GEAR[cᵢ mod 256]   (mod 2⁶⁴)
  *
  * so hᵢ = Σ_{j ≤ i} GEAR[cⱼ]·2^(i−j) mod 2⁶⁴ — contributions age out
  * after 64 characters, which is what makes the hash CONTENT-DEFINED: a
  * boundary depends only on the preceding ≤64 characters, so an edit
  * re-chunks its neighborhood and nothing else (GearChunkerSpec pins that
  * locality property). Position i ends a chunk when the TOP `maskBits`
  * bits of hᵢ are zero (unsigned hᵢ < 2^(64−maskBits) — the top bits mix
  * the longest history; the LOW bits of a gear hash depend only on the
  * last few characters and must not be used). Returned value: the chunk
  * START positions, 1-based — always beginning with 1, then i+1 for every
  * boundary at i < n.
  *
  * GEAR table: GEAR[b] = the first 16 hex digits of md5(b as decimal
  * string), as an unsigned 64-bit value — a fixed, engine-neutral table
  * any SQL engine can re-derive (no seed, no RNG).
  */
case class GearChunkStarts(child: Expression, maskBits: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 63, "maskBits must be in [1, 63]")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_chunk_starts expects a string input, got $t")
    }

  override protected def nullSafeEval(s: Any): Any =
    GearChunkStarts.compute(s.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val r = ctx.freshName("graftGearR")
      s"""org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.expressions.GearChunkStarts.compute($s, $maskBits);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GearChunkStarts {

  /** GEAR[b] = unsigned first-64-bits of md5(b.toString), b = 0..255.
    * Stored in a Long (same 2⁶⁴ residue ring; boundary tests use unsigned
    * comparisons). */
  val Gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      val hex = md.digest(b.toString.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
      md.reset()
      java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
    }
  }

  /** Rolling scan; see class doc for the definition. One pass over the
    * UTF-16 units of the string (BMP contract: code point == UTF-16 unit;
    * the table index is mod 256 either way). */
  def compute(s: UTF8String, maskBits: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val bound = 1L << (64 - maskBits) // unsigned threshold: top maskBits zero
    val starts = scala.collection.mutable.ArrayBuffer[Int](1)
    var h = 0L
    var i = 0
    while (i < n - 1) { // a boundary at the last char starts no new chunk
      h = (h << 1) + Gear(str.charAt(i) % 256)
      // unsigned h < bound  <=>  top maskBits bits are zero
      if (java.lang.Long.compareUnsigned(h, bound) < 0) starts += (i + 2)
      i += 1
    }
    new GenericArrayData(starts.toArray)
  }
}
