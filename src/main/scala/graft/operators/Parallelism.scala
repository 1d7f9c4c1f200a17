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
    *
    * The probe first checks the optimized LOGICAL plan is scan-shaped
    * (projections/filters over a leaf — the narrow-scan call sites this
    * helper exists for). Anything else — joins, aggregates, an existing
    * repartition — returns unchanged: its output is already produced at
    * shuffle width, and, more importantly, probing such a frame with
    * `df.rdd` under AQE would FINALIZE the adaptive plan and execute every
    * upstream query stage as real Spark jobs at DataFrame-construction
    * time (a silent double-execution trap). For a scan-shaped plan there
    * are no exchanges to materialize, so the `.rdd` width probe is pure
    * file-split math — no jobs at any time. */
  def fanOut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case p: Project => scanShaped(p.child)
      case f: Filter => scanShaped(f.child)
      case a: SubqueryAlias => scanShaped(a.child)
      case _ => false
    }
    val width =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (!scanShaped(df.queryExecution.optimizedPlan)) df
    else if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width)
  }
}
