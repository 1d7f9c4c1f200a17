package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.Compaction

/** The ONE ingest-maintenance sequence every cluster-partitioned vector
  * index uses ([[IvfIndex.append]], [[IvfAdc.append]]), factored so the
  * contract cannot drift between them:
  *
  *  1. heal a compaction that died mid-swap (the live dir may be parked at
  *     `__old` — an Append would otherwise recreate it holding just this
  *     batch and strand the history);
  *  2. screen ids — in-batch dedup (an at-least-once upstream can fold a
  *     redelivery into ONE micro-batch, invisible to the anti-join) plus a
  *     left-anti join against the PERSISTED ids, reading only the
  *     column-pruned id projection — so any retry/redelivery lands exactly
  *     once. INSERT-ONLY by construction: a row whose id already exists is
  *     dropped, NOT updated — re-embedding an existing id requires a
  *     rebuild (partition files are immutable; there is no in-place
  *     delete), and callers that need refresh semantics must version ids;
  *  3. encode + append to the `cluster=` partitions;
  *  4. self-compact once fragments exceed `maxFilesPerPartition ×
  *     partitions` — per-partition because the compacted floor IS one file
  *     per partition (see [[Compaction.partitionedFragmentsExceed]]). The
  *     ratio is the rewrite-amortization knob: each compaction rewrites the
  *     whole table, and the threshold admits ~(ratio − 1) fragments per
  *     partition between rewrites, so a streaming sink appending every few
  *     seconds wants a ratio well above 2 (the appends' default is 16:
  *     ≤16 footer reads per probed partition, one full rewrite per ~15
  *     all-partition batches).
  *
  * Single WRITER per index: the compaction swap is two renames a
  * concurrent reader could observe mid-flight.
  */
private[operators] object IndexIngest {

  def appendScreened(spark: SparkSession, dataDir: String, batch: DataFrame,
      idCol: String, encode: DataFrame => DataFrame,
      maxFilesPerPartition: Int): Unit = {
    require(maxFilesPerPartition >= 2,
      s"maxFilesPerPartition must be >= 2, got $maxFilesPerPartition")
    Compaction.recover(spark, dataDir)
    val fresh = batch.dropDuplicates(idCol).join(
      spark.read.parquet(dataDir).select(idCol), Seq(idCol), "left_anti")
    encode(fresh)
      .write.mode(SaveMode.Append)
      .partitionBy("cluster")
      .parquet(dataDir)
    if (Compaction.partitionedFragmentsExceed(spark, dataDir, maxFilesPerPartition))
      Compaction.compactPartitioned(spark, dataDir, "cluster")
  }
}
