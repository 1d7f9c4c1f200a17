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

  def compact(spark: SparkSession, path: String, targetRows: Long): Unit = {
    val df = spark.read.parquet(path)
    val nFiles = plan(df.count(), targetRows)
    val staging = path.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    fs.delete(old, true)
  }
}
