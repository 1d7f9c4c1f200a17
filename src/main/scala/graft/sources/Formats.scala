package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink format surface beyond parquet: CSV and JSON lines, with
  * explicit schemas on read (schema inference is a full extra pass over the
  * data — never acceptable at scale) and ISO-8601 UTC timestamps so
  * round-trips are lossless.
  */
object Formats {

  // six fractional digits: micros-precision columns (e.g. events.ts) must
  // survive the round-trip
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", true)
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("timestampFormat", TsFormat)
      .schema(schema)
      .csv(path)

  /** Malformed-tolerant CSV ingest: PERMISSIVE mode lands every row, with
    * rows that fail the schema null-padded and their raw line captured in
    * `_corrupt_record` — quarantine-and-continue, the ingest posture for
    * external feeds at scale (a single bad line must not kill a 100 TB
    * load; the corrupt column IS the dead-letter queue, filterable into a
    * quarantine sink). Row-local parsing, no extra passes. Spark refuses
    * queries that reference ONLY the corrupt column straight off the raw
    * file — persist or write the parsed frame before routing the
    * quarantine. */
  def readCsvPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFormat)
      .schema(schema)
      .json(path)

  /** ORC: the other columnar container (vectorized reader, predicate
    * pushdown, same split-by-stripe parallelism story as parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Partitioned-by-column parquet layout: the warehouse-zone layout that
    * lets Catalyst prune entire directories on partition-key predicates
    * (asserted in FormatsSpec via PartitionFilters). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
