package graft.operators

import org.apache.spark.sql.DataFrame

/** Compute-parallelism helper: a parquet scan parallelizes by file/row-group,
  * so a single-row-group input runs any per-row compute (hashing, cosine
  * loops, tokenization) on ONE task no matter how many cores exist. CPU-heavy
  * operators fan their input out to the shuffle-partition width first — a few
  * MB of extra shuffle buying full-width execution. The same move is right at
  * 100 TB whenever a selective filter (or coalesced scan) has collapsed
  * partition count below cluster width.
  */
object Parallelism {

  /** Repartition `df` to shuffle width — ONLY when its scan is actually
    * narrower. A 100 TB corpus scan already carries thousands of splits;
    * shuffling its full rows (for MinHash, the document TEXT) before a
    * per-row projection would be the most expensive no-op in the pipeline.
    * The width probe plans the child (no exchange below it by contract of
    * the call sites — raw scans/projections), runs nothing, and skips the
    * exchange whenever the scan is already at or above cluster width. */
  def fanOut(df: DataFrame): DataFrame = {
    val width =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions >= width) df else df.repartition(width)
  }
}
