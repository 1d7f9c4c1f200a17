package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The union-window as-of lookup must equal the brute-force interval join
  * over the versioned dimension (valid_from <= ts < valid_to-or-open) on
  * every probe — including boundary instants, unknown keys, probes before
  * a key's first version, and versions with NULL attributes. */
class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-$s")

  private val dim = Seq(
    (1L, Some("gold"), t("01 00:00:00"), Some(t("05 00:00:00"))),
    (1L, Some("plat"), t("05 00:00:00"), Option.empty[Timestamp]),
    (2L, Option.empty[String], t("03 00:00:00"), Some(t("07 00:00:00"))), // NULL attr version
    (2L, Some("free"), t("07 00:00:00"), Option.empty[Timestamp]))
    .toDF("k", "seg", "valid_from", "valid_to")

  private val probes = Seq(
    (10L, 1L, t("02 00:00:00")), // inside first version
    (11L, 1L, t("05 00:00:00")), // exact boundary: the NEW version applies
    (12L, 1L, t("09 00:00:00")), // open version
    (13L, 2L, t("01 00:00:00")), // before the key's first version -> null
    (14L, 2L, t("04 00:00:00")), // inside the NULL-attr version -> null seg, matched
    (15L, 9L, t("04 00:00:00"))) // unknown key -> null
    .toDF("event_id", "k", "ts")

  test("as-of lookup equals the brute-force interval join on every probe") {
    val got = PointInTime.lookup(dim, probes, Seq("k"), "ts", Seq("seg"))
    val brute = probes.as("p").join(dim.as("d"),
        col("p.k") === col("d.k") && col("p.ts") >= col("d.valid_from") &&
          (col("d.valid_to").isNull || col("p.ts") < col("d.valid_to")),
        "left")
      .select(col("event_id"), col("p.k").as("k"), col("ts"), col("d.seg").as("seg"))
    assert(rowSet(got) == rowSet(brute))
    assert(rowSet(got) == Seq(
      "[10,1,2024-01-02 00:00:00.0,gold]",
      "[11,1,2024-01-05 00:00:00.0,plat]",
      "[12,1,2024-01-09 00:00:00.0,plat]",
      "[13,2,2024-01-01 00:00:00.0,null]",
      "[14,2,2024-01-04 00:00:00.0,null]",
      "[15,9,2024-01-04 00:00:00.0,null]"))
  }

  test("a NULL attribute inside a matched version does not fall through " +
      "to an older version") {
    // key 2 at 01-08: open version "free"; at 01-04 the NULL-attr version
    // is matched and must report null, NOT leak an older value — here the
    // older version doesn't exist, so construct one on key 1 instead:
    // probe key 1 during a null-attr middle version
    val dim2 = Seq(
      (1L, Some("gold"), t("01 00:00:00"), Some(t("05 00:00:00"))),
      (1L, Option.empty[String], t("05 00:00:00"), Some(t("09 00:00:00"))),
      (1L, Some("plat"), t("09 00:00:00"), Option.empty[Timestamp]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val p = Seq((1L, 1L, t("06 00:00:00"))).toDF("event_id", "k", "ts")
    val got = PointInTime.lookup(dim2, p, Seq("k"), "ts", Seq("seg"))
    assert(rowSet(got) == Seq("[1,1,2024-01-06 00:00:00.0,null]"))
  }

  test("probe columns pass through untouched and attr-name collisions are rejected") {
    val got = PointInTime.lookup(dim, probes, Seq("k"), "ts", Seq("seg"))
    assert(got.columns.toSeq == Seq("event_id", "k", "ts", "seg"))
    intercept[IllegalArgumentException] {
      PointInTime.lookup(dim,
        probes.withColumn("seg", lit("x")), Seq("k"), "ts", Seq("seg"))
    }
  }
}
