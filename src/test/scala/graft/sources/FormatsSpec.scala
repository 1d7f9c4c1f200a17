package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  test("CSV and JSON round-trips are lossless for the orders table") {
    val root = Files.createTempDirectory("graft-formats").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val want = rowSet(orders)

    Formats.writeCsv(orders, s"$root/csv")
    assert(rowSet(Formats.readCsv(spark, s"$root/csv", orders.schema)) == want)

    Formats.writeJson(orders, s"$root/json")
    assert(rowSet(Formats.readJson(spark, s"$root/json", orders.schema)) == want)
  }

  test("ORC round-trip is lossless for the orders table") {
    val root = Files.createTempDirectory("graft-formats-orc").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    Formats.writeOrc(orders, s"$root/orc")
    assert(rowSet(Formats.readOrc(spark, s"$root/orc", orders.schema)) == rowSet(orders))
  }

  test("partitioned parquet write prunes partitions on key predicates") {
    val root = Files.createTempDirectory("graft-formats-part").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    Formats.writePartitioned(orders, s"$root/by_status", "o_orderstatus")
    val df = spark.read.parquet(s"$root/by_status")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)
    // the pruned scan must read only the matching directory
    assert(rowSet(df.drop("o_orderstatus")) ==
      rowSet(orders.filter(orders("o_orderstatus") === "F").drop("o_orderstatus")))
  }

  test("compaction collapses many small files, preserving every row") {
    val root = Files.createTempDirectory("graft-compact").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    orders.repartition(40).write.parquet(s"$root/t")
    def parquetFiles = new java.io.File(s"$root/t").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 40)
    val want = rowSet(orders)

    Compaction.compact(spark, s"$root/t", targetRows = 1000)
    assert(parquetFiles == Compaction.plan(orders.count(), 1000))
    assert(rowSet(spark.read.parquet(s"$root/t")) == want)
  }

  test("compaction recovers the half-swapped crash state (live dir missing, data in __old)") {
    val root = Files.createTempDirectory("graft-compact-crash").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    orders.repartition(8).write.parquet(s"$root/t")
    val want = rowSet(orders)
    // simulate a crash between rename(path -> __old) and
    // rename(staging -> path): the only copy sits in __old plus a stale
    // half-written staging dir
    assert(new java.io.File(s"$root/t").renameTo(new java.io.File(s"$root/t__old")))
    new java.io.File(s"$root/t__compacting").mkdirs()
    assert(!new java.io.File(s"$root/t").exists())

    Compaction.compact(spark, s"$root/t", targetRows = 1000)
    assert(rowSet(spark.read.parquet(s"$root/t")) == want, "recovery lost rows")
    assert(!new java.io.File(s"$root/t__old").exists())
    assert(!new java.io.File(s"$root/t__compacting").exists())
  }

  test("permissive CSV ingest quarantines malformed rows instead of failing the load") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-badcsv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/in.csv"),
      """id,price
        |1,10.5
        |2,not_a_number
        |3,30.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    // cache first: Spark disallows querying ONLY the corrupt column straight
    // off the raw file (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — production
    // writes the parsed result before routing the quarantine anyway
    val got = Formats.readCsvPermissive(spark, s"$root/in.csv", schema).cache()
    assert(got.count() == 3, "no row may be silently dropped")
    val bad = got.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    val badRow = bad.collect()(0)
    assert(badRow.getAs[String]("_corrupt_record") == "2,not_a_number")
    assert(badRow.isNullAt(badRow.fieldIndex("price")),
      "the failed column must be null-padded")
    // clean rows parse fully
    assert(got.filter(col("_corrupt_record").isNull).count() == 2)
  }

  test("parquet aggregate pushdown: MIN/MAX/COUNT answered from footer stats, no row scan") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-aggpush").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    orders.select("o_orderkey", "o_totalprice").write.parquet(s"$root/t")
    // pushdown lives in the DSv2 reader: drop parquet from the v1 list
    val conf = "spark.sql.parquet.aggregatePushdown"
    val v1 = "spark.sql.sources.useV1SourceList"
    val (old, oldV1) = (spark.conf.get(conf, "false"), spark.conf.get(v1))
    try {
      spark.conf.set(conf, "true")
      spark.conf.set(v1, oldV1.split(",").filterNot(_.trim == "parquet").mkString(","))
      val agg = spark.read.parquet(s"$root/t").agg(
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"),
        count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"expected MIN/MAX/COUNT pushed into the parquet scan:\n$plan")
      // and the pushed answer must equal the row-scan answer
      val want = orders.agg(min(col("o_totalprice")), max(col("o_totalprice")),
        count(lit(1))).collect()(0)
      assert(agg.collect()(0) === want)
    } finally {
      spark.conf.set(conf, old)
      spark.conf.set(v1, oldV1)
    }
  }

  test("schema evolution: mergeSchema reads old files with the widened schema") {
    val root = Files.createTempDirectory("graft-evolve").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    orders.select("o_orderkey", "o_totalprice").write.parquet(s"$root/t")
    orders.select("o_orderkey", "o_totalprice")
      .withColumn("o_channel", org.apache.spark.sql.functions.lit("web"))
      .write.mode("append").parquet(s"$root/t")

    val merged = spark.read.option("mergeSchema", true).parquet(s"$root/t")
    assert(merged.columns.sorted.toSeq == Seq("o_channel", "o_orderkey", "o_totalprice"))
    assert(merged.count() == orders.count() * 2)
    // rows from pre-evolution files surface the new column as null
    assert(merged.filter(merged("o_channel").isNull).count() == orders.count())
  }

  test("events round-trips through JSON with nanos already truncated to micros") {
    val root = Files.createTempDirectory("graft-formats-ev").toString
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    Formats.writeJson(events, s"$root/json")
    val back = Formats.readJson(spark, s"$root/json", events.schema)
    assert(rowSet(back) == rowSet(events))
  }
}
