package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.SegmentedTable

/** The ONE ingest-maintenance sequence every cluster-partitioned vector
  * index uses ([[IvfIndex.append]], [[IvfAdc.append]]), factored so the
  * contract cannot drift between them — the
  * [[graft.sources.SegmentedTable]] manifest protocol specialized to
  * `seg=<v>/cluster=<c>/` data:
  *
  *  1. screen ids — in-batch dedup (an at-least-once upstream can fold a
  *     redelivery into ONE micro-batch, invisible to the anti-join) plus a
  *     left-anti join against the PERSISTED live ids, reading only the
  *     column-pruned id projection — so any retry/redelivery lands exactly
  *     once. INSERT-ONLY by construction: a row whose id already exists is
  *     dropped, NOT updated — re-embedding an existing id requires a
  *     rebuild (segments are immutable; there is no in-place delete), and
  *     callers that need refresh semantics must version ids;
  *  2. encode + stage the batch as an INVISIBLE `seg=<v>/` segment (its
  *     own `cluster=` partitions inside) — a crash before the publish
  *     leaves an inert orphan that the retry overwrites (same version
  *     allocation), never a torn table;
  *  3. publish with one atomic manifest flip;
  *  4. self-compact once the live segment count exceeds `maxSegments`:
  *     rewrite the live segments into one (one file per cluster) and flip.
  *     `maxSegments` is the rewrite-amortization knob — each compaction
  *     rewrites the whole table, and the threshold admits ~maxSegments
  *     batches between rewrites, during which a probed cluster pays at
  *     most one small-file read per live segment (the appends' default is
  *     16). Superseded segments are RETAINED for in-flight readers until
  *     the writer vacuums ([[SegmentedTable.vacuum]]).
  *
  * Single WRITER per index (appends/compactions/vacuums serialize); a
  * reader's manifest pins a complete immutable snapshot, so serves are
  * safe against concurrent appends until the writer vacuums.
  */
private[operators] object IndexIngest {

  /** Live rows of the index's data table — one manifest-pinned scan;
    * static `seg IN` pruning composes with the caller's own partition
    * filters and dynamic pruning on `cluster`. */
  def readLive(spark: SparkSession, root: String, dataName: String): DataFrame =
    SegmentedTable.read(spark, s"$root/$dataName",
      SegmentedTable.readManifest(spark, root))

  def appendScreened(spark: SparkSession, root: String, dataName: String,
      batch: DataFrame, idCol: String, encode: DataFrame => DataFrame,
      maxSegments: Int): Unit = {
    require(maxSegments >= 2, s"maxSegments must be >= 2, got $maxSegments")
    val dataDir = s"$root/$dataName"
    val m = SegmentedTable.readManifest(spark, root)
    val fresh = batch.dropDuplicates(idCol).join(
      SegmentedTable.read(spark, dataDir, m).select(idCol),
      Seq(idCol), "left_anti")
    val v = m.version + 1
    val segDir = SegmentedTable.segDir(dataDir, v)
    encode(fresh)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(segDir)
    // a fully-screened batch (replay, in-batch dups only) stages an EMPTY
    // segment — a partitioned write of zero rows lands no data files.
    // Publishing it would grow the live list per replay and, worse, tick
    // the compaction threshold: a stream of replays would trigger a
    // pointless whole-table rewrite every maxSegments batches. Skip the
    // flip (the dir is inert either way — unpublished, and the next
    // append's Overwrite at the same version wipes it).
    val fs = new org.apache.hadoop.fs.Path(segDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listFiles(new org.apache.hadoop.fs.Path(segDir), true)
    var hasRows = false
    while (!hasRows && staged.hasNext)
      hasRows = staged.next().getPath.getName.endsWith(".parquet")
    if (hasRows)
      SegmentedTable.writeManifest(spark, root,
        SegmentedTable.Manifest(v, m.segments :+ v))
    // the bound is enforced even on a skipped (empty) publish: a caller
    // tightening maxSegments must see the index compacted by its next
    // append, whatever that batch contains
    if (m.segments.length + (if (hasRows) 1 else 0) > maxSegments)
      compact(spark, root, dataName)
  }

  /** Rewrite the live segments into ONE — clustering the shuffle on the
    * partition column puts each cluster's rows in one writer task, so the
    * compacted segment lands exactly one file per cluster (the
    * serve-optimal shape for an index whose reads always scan whole
    * probed clusters; parquet row groups keep a single large file
    * read-parallel) — and publish it with a manifest flip. Superseded
    * segments are retained for in-flight readers; vacuum reclaims them. */
  def compact(spark: SparkSession, root: String, dataName: String): Unit = {
    val dataDir = s"$root/$dataName"
    val m = SegmentedTable.readManifest(spark, root)
    val v = m.version + 1
    SegmentedTable.read(spark, dataDir, m)
      .repartition(org.apache.spark.sql.functions.col("cluster"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(SegmentedTable.segDir(dataDir, v))
    SegmentedTable.writeManifest(spark, root,
      SegmentedTable.Manifest(v, Seq(v)))
  }
}
