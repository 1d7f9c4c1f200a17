package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for plain LAKE tables — the maintenance job that
  * keeps scan parallelism healthy: streaming appends and per-channel
  * ingests (K1) accumulate many small files, and at scale a million tiny
  * files costs more in task scheduling and footer reads than the data
  * itself.
  *
  * `compact` rewrites a parquet directory IN PLACE into
  * `ceil(rows / targetRows)` files via a round-robin repartition (even
  * sizes, no skew), staging into a sibling directory first so a crash
  * mid-rewrite never destroys the source (the swap is two renames, with
  * [[recover]] healing the mid-swap crash window). This in-place form is
  * for ad-hoc lake directories that have no version authority of their
  * own; the persisted INDEXES do not use it — their maintenance is the
  * strictly safer [[SegmentedTable]] manifest protocol (invisible staging
  * + atomic manifest flip, no torn-swap window at all), which needs a
  * manifest to name the live segments.
  */
object Compaction {

  def plan(rows: Long, targetRows: Long): Int =
    math.max(1, math.ceil(rows.toDouble / targetRows).toInt)

  def compact(spark: SparkSession, path: String, targetRows: Long): Unit =
    rewrite(spark, path, rows => plan(rows(), targetRows))

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
