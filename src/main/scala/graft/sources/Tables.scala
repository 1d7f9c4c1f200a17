package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic star schema (TESTDATA.md): one parquet file per
  * table per scale-factor directory.
  *
  * Scale posture: these are plain columnar scans — callers `select` only the
  * columns they need and put filters early so Catalyst pushes both into the
  * parquet reader (`PushedFilters` / `ReadSchema` in `.explain`). At 100 TB
  * the same code reads a partitioned directory tree; nothing here assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The events fixture stores TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; read nanos as long and truncate to micros (matching
      // DuckDB's CAST(ts AS TIMESTAMP) truncation).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
