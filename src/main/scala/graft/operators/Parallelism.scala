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
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
}
