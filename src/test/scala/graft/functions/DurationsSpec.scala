package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DurationsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(durs: Seq[String]): Seq[Long] =
    durs.toDF("d")
      .select(Durations.parseIso8601Duration(col("d")).as("s"))
      .as[Long].collect().toSeq

  test("property: parse(PT{h}H{m}M{s}S) == h*3600 + m*60 + s over a grid") {
    val grid = for {
      h <- Seq(0, 1, 2, 23, 99)
      m <- Seq(0, 1, 59)
      s <- Seq(0, 1, 59)
    } yield (h, m, s)
    val durs = grid.map { case (h, m, s) => s"PT${h}H${m}M${s}S" }
    val expected = grid.map { case (h, m, s) => h * 3600L + m * 60L + s }
    assert(parse(durs) == expected)
  }

  test("absent components count as zero (reference regex semantics, app.py:110-126)") {
    assert(parse(Seq("PT4M13S", "PT1H2S", "PT45S", "PT2H", "PT", "")) ==
      Seq(253L, 3602L, 45L, 7200L, 0L, 0L))
  }

  test("null input parses to 0 (total function, unlike the reference)") {
    val got = Seq(Some("PT1M"), None).toDF("d")
      .select(Durations.parseIso8601Duration(col("d")).as("s"))
      .as[Long].collect().toSeq
    assert(got == Seq(60L, 0L))
  }
}
