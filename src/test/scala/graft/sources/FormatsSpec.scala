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

  test("events round-trips through JSON with nanos already truncated to micros") {
    val root = Files.createTempDirectory("graft-formats-ev").toString
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    Formats.writeJson(events, s"$root/json")
    val back = Formats.readJson(spark, s"$root/json", events.schema)
    assert(rowSet(back) == rowSet(events))
  }
}
