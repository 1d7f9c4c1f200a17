package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: pre-shuffle fact/dimension tables into the same
  * bucket layout on the join key so every subsequent equi-join on that key
  * is CO-LOCATED — a sort-merge join with no Exchange on either side.
  *
  * This is the warehouse-layout half of the 100 TB shuffle budget: a join
  * that would move the whole fact table on every query instead moves it once
  * at write time. Bucket counts should be sized so one bucket ≈ one
  * comfortable task (128–512 MB of parquet).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet catalog table. */
  def write(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join of two tables bucketed on `key` with matching bucket counts
    * — plans with zero shuffle exchanges (asserted in BucketedSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
