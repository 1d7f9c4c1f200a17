package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-$s")

  // dimension: (k, tier, region, valid_from, valid_to)
  private val dim = Seq(
    (1L, "gold", "eu", t("01 00:00:00"), Option.empty[Timestamp]),
    (2L, "free", "us", t("01 00:00:00"), Some(t("03 00:00:00"))),
    (2L, "gold", "us", t("03 00:00:00"), Option.empty[Timestamp]))
    .toDF("k", "tier", "region", "valid_from", "valid_to")

  private def merge(upd: org.apache.spark.sql.DataFrame) =
    Scd2.merge(dim, upd, Seq("k"), Seq("tier", "region"), "ts")

  test("changed attrs close the open version and open a new one") {
    val upd = Seq((1L, "plat", "eu", t("05 00:00:00"))).toDF("k", "tier", "region", "ts")
    val got = merge(upd)
    assert(rowSet(got.filter(col("k") === 1)) == Seq(
      "[1,gold,eu,2024-01-01 00:00:00.0,2024-01-05 00:00:00.0]",
      "[1,plat,eu,2024-01-05 00:00:00.0,null]"))
    // untouched key carries over completely
    assert(rowSet(got.filter(col("k") === 2)) == rowSet(dim.filter(col("k") === 2)))
  }

  test("an update equal to the open version is a no-op; replay is idempotent") {
    val upd = Seq((1L, "gold", "eu", t("05 00:00:00"))).toDF("k", "tier", "region", "ts")
    assert(rowSet(merge(upd)) == rowSet(dim))
    // and a changed batch applied twice equals applied once
    val chg = Seq((1L, "plat", "eu", t("05 00:00:00"))).toDF("k", "tier", "region", "ts")
    val once = merge(chg)
    val twice = Scd2.merge(once, chg, Seq("k"), Seq("tier", "region"), "ts")
    assert(rowSet(twice) == rowSet(once))
  }

  test("several changes in one batch chain intermediate versions") {
    val upd = Seq(
      (1L, "plat", "eu", t("05 00:00:00")),
      (1L, "plat", "us", t("07 00:00:00")),
      (1L, "plat", "us", t("09 00:00:00"))) // dup of the 07 state: no-op
      .toDF("k", "tier", "region", "ts")
    val got = merge(upd).filter(col("k") === 1)
    assert(rowSet(got) == Seq(
      "[1,gold,eu,2024-01-01 00:00:00.0,2024-01-05 00:00:00.0]",
      "[1,plat,eu,2024-01-05 00:00:00.0,2024-01-07 00:00:00.0]",
      "[1,plat,us,2024-01-07 00:00:00.0,null]"))
  }

  test("a new key inserts its first open version") {
    val upd = Seq((9L, "free", "ap", t("04 00:00:00"))).toDF("k", "tier", "region", "ts")
    val got = merge(upd)
    assert(rowSet(got.filter(col("k") === 9)) ==
      Seq("[9,free,ap,2024-01-04 00:00:00.0,null]"))
    assert(got.count() == dim.count() + 1)
  }

  test("stale updates (not after the open valid_from) are dropped") {
    // key 2's open version starts 01-03; an 01-02 update must not rewind it
    val upd = Seq((2L, "plat", "us", t("02 00:00:00"))).toDF("k", "tier", "region", "ts")
    assert(rowSet(merge(upd)) == rowSet(dim))
  }

  test("equal-timestamp updates collapse deterministically (greatest attr struct wins)") {
    // two conflicting updates for one key at the SAME ts: without the
    // declared collapse, lag/lead order over the tie is run-dependent and
    // lead() would mint a zero-width [t, t) version. The rule keeps the
    // greatest (tier, region) struct — here ("plat","us") > ("plat","eu").
    val upd = Seq(
      (1L, "plat", "eu", t("05 00:00:00")),
      (1L, "plat", "us", t("05 00:00:00")))
      .toDF("k", "tier", "region", "ts")
    val got = merge(upd).filter(col("k") === 1)
    assert(rowSet(got) == Seq(
      "[1,gold,eu,2024-01-01 00:00:00.0,2024-01-05 00:00:00.0]",
      "[1,plat,us,2024-01-05 00:00:00.0,null]"))
    // no zero-width interval anywhere
    assert(merge(upd).filter(col("valid_to") === col("valid_from")).isEmpty)
    // exact-duplicate rows collapse to themselves (idempotent ingest shape)
    val dup = Seq(
      (1L, "plat", "eu", t("05 00:00:00")),
      (1L, "plat", "eu", t("05 00:00:00")))
      .toDF("k", "tier", "region", "ts")
    assert(rowSet(merge(dup).filter(col("k") === 1)) == Seq(
      "[1,gold,eu,2024-01-01 00:00:00.0,2024-01-05 00:00:00.0]",
      "[1,plat,eu,2024-01-05 00:00:00.0,null]"))
  }

  test("exactly one open version per key survives any merge") {
    val upd = Seq(
      (1L, "plat", "eu", t("05 00:00:00")),
      (2L, "free", "us", t("06 00:00:00")),
      (9L, "free", "ap", t("04 00:00:00")))
      .toDF("k", "tier", "region", "ts")
    val got = merge(upd)
    val opens = got.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") =!= 1)
    assert(opens.isEmpty)
    // and intervals per key tile without overlap: each close = next open
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy("valid_from")
    val gaps = got
      .withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .filter(col("nxt").isNotNull && !(col("valid_to") <=> col("nxt")))
    assert(gaps.isEmpty)
  }
}
