package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Z-order (Morton-curve) clustered layout — the data-layout lever for
  * multi-dimensional file skipping. Sorting a table by one column gives
  * perfect parquet min/max pruning on that column and NONE on any other; at
  * 100 TB a filter on the second dimension then scans everything.
  * Interleaving the bits of two columns into one sort key makes files cover
  * small RECTANGLES of the (a, b) domain instead of thin stripes, so
  * min/max row-group stats prune scans on EITHER column (the layout Delta
  * Lake's OPTIMIZE ZORDER BY computes; here as a plain Spark write).
  *
  * `zValue` expects non-negative integer bucket columns already bounded to
  * `bits` bits — the caller chooses the bucketization (`floor(price/δ)`, a
  * day number, a hash prefix), which keeps the expression a pure
  * bit-interleave: fully codegen'd shifts/masks, no sampling pass, no UDF.
  * The write is one range repartition on the z-value (sampled bounds, even
  * output files) plus an in-partition sort — exactly two passes over the
  * data, shuffle keyed on a single long.
  */
object ZOrder {

  /** Morton interleave of two `bits`-bit non-negative ints: bit j of `a`
    * lands at position 2j, bit j of `b` at 2j+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { j =>
      val abit = shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)), 2 * j)
      val bbit = shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` to `path` as `nFiles` parquet files clustered on the
    * z-curve of (a, b): range-repartition on the z-value, sort within each
    * partition, drop the helper column. Each output file then covers a
    * compact block of the (a, b) domain. */
  def writeClustered(df: DataFrame, path: String, a: Column, b: Column,
      bits: Int, nFiles: Int): Unit = {
    df.withColumn("__z", zValue(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
