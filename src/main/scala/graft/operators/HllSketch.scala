package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** First-principles HyperLogLog (Flajolet et al. 2007) shared by the judged
  * batch audit (dq_hll_distinct) and the streaming register-ledger sink
  * ([[graft.streaming.EventStreams.startHllLedgerSink]]) — ONE definition
  * of the register/rank/estimate contract, so the streaming serving path
  * can never drift from the batch formula it is spec'd against (the PII
  * single-definition lesson).
  *
  * Design for cross-engine exactness (every piece re-derivable in DuckDB):
  *   - 256 registers keyed by the first two md5 hex chars — the register
  *     key STAYS a string (the MinHash band-key discipline; no hex→int
  *     conversion exists portably in both engines);
  *   - rank ρ = leading zero BITS of the next 13 hex chars (52 bits) + 1,
  *     via pure string ops: strip leading '0' nibbles, one CASE on the
  *     first nonzero nibble; all-zero ⇒ ρ = 53;
  *   - the harmonic sum Σ 2^(−M_j) is held EXACT as Σ 2^(53−M_j) in longs
  *     (≤ 256·2^53 ≈ 2.3e18 — fits), absent registers contributing 2^53;
  *   - α₂₅₆ = 0.7213/(1 + 1.079/256) enters as the 6dp LITERAL 0.718273,
  *     and the estimate is one mirrored double chain over exact integers.
  *
  * Scale shape: [[registers]] folds ANY corpus to ≤256 rows through one
  * map-combined max — the canonical mergeable-sketch shape (each executor
  * folds its partition to 256 rows before the exchange), and [[merge]] of
  * ledgers is the same max, associative, commutative, and idempotent
  * (re-asserting a maximum is a no-op — what makes the streaming ledger
  * replay-safe twice over: by addressing AND by algebra).
  */
object HllSketch {

  val NumRegisters = 256

  /** ≤256 rows (reg: string, m_j: long) — the register maxima of `textCol`
    * over `df` (null texts skipped). */
  def registers(df: DataFrame, textCol: Column): DataFrame = {
    val h = md5(textCol)
    val rem = substring(h, 3, 13)
    val nz = regexp_replace(rem, "^0+", "")
    val first = substring(nz, 1, 1)
    val rho = when(length(nz) === 0, lit(53L)).otherwise(
      ((lit(13) - length(nz)) * 4 +
        when(first === "1", 3)
          .when(first.isin("2", "3"), 2)
          .when(first.isin("4", "5", "6", "7"), 1)
          .otherwise(0) + 1).cast("long"))
    df.filter(textCol.isNotNull)
      .select(substring(h, 1, 2).as("reg"), rho.as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("m_j"))
  }

  /** Fold any union of register frames back to ≤256 maxima. */
  def merge(regs: DataFrame): DataFrame =
    regs.groupBy("reg").agg(max(col("m_j")).as("m_j"))

  /** One row (n_regs, z53, estimate) from a ≤256-row register frame. */
  def estimate(regs: DataFrame): DataFrame =
    regs.agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))"))
          .as("zp"))
      .select(col("n_regs"),
        (col("zp") + (lit(256L) - col("n_regs")) * lit(9007199254740992L))
          .as("z53"))
      .select(col("n_regs"), col("z53"),
        (lit(0.718273) * lit(65536.0) * lit(9007199254740992.0) /
          col("z53").cast("double")).as("estimate"))

  /** Serve the distinct-count estimate from a streaming register ledger
    * (per-batch `batch_id=N` partitions of register maxima): fold the
    * ≤256·batches ledger rows to the register maxima, then the shared
    * estimate — history (the raw stream) is never re-scanned, and the
    * ledger itself stays kilobytes per batch. */
  def estimateFromLedger(spark: SparkSession, ledgerDir: String): DataFrame =
    estimate(merge(spark.read.parquet(ledgerDir).select("reg", "m_j")))
}
