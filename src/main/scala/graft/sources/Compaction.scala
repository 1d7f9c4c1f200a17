package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the lakehouse maintenance job that keeps scan
  * parallelism healthy: streaming appends and per-channel ingests (K1)
  * accumulate many small files, and at scale a million tiny files costs more
  * in task scheduling and footer reads than the data itself.
  *
  * `compact` rewrites a parquet directory into `ceil(rows / targetRows)`
  * files via a round-robin repartition (even sizes, no skew), staging into a
  * sibling directory first so a crash mid-rewrite never destroys the source
  * (the swap is two renames).
  */
object Compaction {

  def plan(rows: Long, targetRows: Long): Int =
    math.max(1, math.ceil(rows.toDouble / targetRows).toInt)

  /** Rewrite to a FIXED file count regardless of row count — the form index
    * maintenance wants (e.g. [[graft.operators.BandIndex]] bounding its
    * per-batch append fragments). Same staged-swap crash safety. The row
    * count is never computed on this path (the thunk goes unused), so no
    * counting job runs. */
  def compactToFiles(spark: SparkSession, path: String, nFiles: Int): Unit =
    rewrite(spark, path, _ => math.max(1, nFiles))

  def compact(spark: SparkSession, path: String, targetRows: Long): Unit =
    rewrite(spark, path, rows => plan(rows(), targetRows))

  /** Compaction for a Hive-PARTITIONED directory (`col=value/` subdirs):
    * rewrites to one file per partition value while PRESERVING the layout
    * readers prune on — the flat forms above would read the partition column
    * back as data and write an unpartitioned directory, silently destroying
    * partition pruning for every later scan (e.g.
    * [[graft.operators.IvfAdc]]'s probed-cluster reads). Clustering the
    * shuffle on the partition column puts each partition value's rows in one
    * writer task, so the rewrite lands exactly one file per value — the
    * serve-optimal shape for an index whose reads always scan whole
    * partitions (parquet row groups keep a single large file
    * read-parallel). Same staged-swap crash safety / [[recover]] contract
    * as the flat forms. */
  def compactPartitioned(spark: SparkSession, path: String,
      partitionCol: String): Unit =
    rewriteWith(spark, path, (df, staging) =>
      df.repartition(org.apache.spark.sql.functions.col(partitionCol))
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
        .parquet(staging))

  /** True when `path` holds more than `maxFiles` parquet fragments
    * (recursive, so partitioned layouts count their `col=value/` subdirs'
    * files). Stops listing at maxFiles+1 — the caller only needs the
    * threshold crossing, not the exact count. */
  def fragmentsExceed(spark: SparkSession, path: String, maxFiles: Int): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(dir, true)
    var n = 0
    while (n <= maxFiles && it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n > maxFiles
  }

  /** Threshold check for a PARTITIONED directory, scaled to its partition
    * count: true when the fragment count exceeds
    * `maxFilesPerPartition × (number of partition dirs)`. The threshold
    * must be per-partition because [[compactPartitioned]]'s floor is one
    * file per partition value — an ABSOLUTE cap below the partition count
    * would re-trigger after every append forever, rewriting the whole
    * table per batch. With a ratio >= 2 the post-compaction count (= the
    * partition count) sits at or below half the threshold, so compaction
    * always buys headroom proportional to the table's own layout. */
  def partitionedFragmentsExceed(spark: SparkSession, path: String,
      maxFilesPerPartition: Int): Boolean = {
    require(maxFilesPerPartition >= 2,
      "a per-partition ratio < 2 cannot guarantee compaction progress " +
        s"(the floor is 1 file/partition), got $maxFilesPerPartition")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nParts = fs.listStatus(dir)
      .count(s => s.isDirectory && s.getPath.getName.contains("="))
    // threshold in Long, capped at Int.MaxValue: a disable-sentinel ratio
    // (e.g. 1e6) times thousands of partitions overflows Int to a NEGATIVE
    // threshold — which would flip "never compact" into "rewrite the whole
    // table on every append", the exact pathology this check prevents
    val threshold =
      math.min(Int.MaxValue.toLong, maxFilesPerPartition.toLong * nParts).toInt
    nParts > 0 && fragmentsExceed(spark, path, threshold)
  }

  /** Restore `path` if a prior compaction died between its two swap renames
    * (live dir missing, the ONLY copy parked at `path__old`). Safe and cheap
    * (two `exists` probes) when nothing is wrong. EVERY writer or reader
    * that touches a compaction-managed directory outside `rewrite` must call
    * this first: an append that recreates a missing live dir would strand
    * the parked history as a "superseded copy" that a later compaction
    * deletes — silent loss of everything but the newest batch. */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    if (!fs.exists(dst) && fs.exists(old) && !fs.rename(old, dst))
      throw new java.io.IOException(
        s"compaction recovery failed: cannot restore $old -> $dst")
  }

  private def rewrite(spark: SparkSession, path: String,
      nFilesOf: (() => Long) => Int): Unit =
    rewriteWith(spark, path, (df, staging) =>
      df.repartition(nFilesOf(() => df.count()))
        .write.mode(SaveMode.Overwrite).parquet(staging))

  private def rewriteWith(spark: SparkSession, path: String,
      write: (org.apache.spark.sql.DataFrame, String) => Unit): Unit = {
    val staging = path.stripSuffix("/") + "__compacting"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val stg = new org.apache.hadoop.fs.Path(staging)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    // crash recovery FIRST (before the read below can even see the dir): a
    // prior run that died between the two swap renames leaves the live dir
    // missing and the ONLY copy parked at __old — restore it before
    // anything else (deleting __old in that state would destroy the data)
    recover(spark, path)
    // a leftover __old/staging from a crashed prior run would make the
    // renames below no-op or nest directories; clear them before starting
    // (the live data is verified present at `path` above, so both are
    // superseded copies, safe to drop)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(stg)) fs.delete(stg, true)
    write(spark.read.parquet(path), staging)
    // rename returns false instead of throwing on most FileSystems — check
    // each step so a failed swap surfaces instead of silently corrupting
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compaction swap failed: $dst -> $old")
    if (!fs.rename(stg, dst)) {
      fs.rename(old, dst) // restore the original before failing
      throw new java.io.IOException(s"compaction swap failed: $stg -> $dst")
    }
    fs.delete(old, true)
  }
}
