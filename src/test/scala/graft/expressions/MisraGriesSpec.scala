package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec
import graft.functions.TextFunctions

/** Misra–Gries sketch bounds, exercised where they actually bite: a
  * vocabulary far larger than the sketch capacity, under skew, across
  * different partition widths (Spark's partial/merge split IS the mergeable-
  * summaries composition, so the bounds must hold at any width). */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed stream: 5 heavy keys with 1000..5000 copies over a uniform tail
    * of 2000 distinct keys × 3 copies each (N = 21000). */
  private lazy val skewed: DataFrame = {
    val heavy = (1 to 5).flatMap(i => Seq.fill(i * 1000)(s"heavy_$i"))
    val tail = (1 to 2000).flatMap(i => Seq.fill(3)(f"tail_$i%05d"))
    (heavy ++ tail).toDF("token")
  }

  private def sketch(df: DataFrame, capacity: Int): Map[String, Long] =
    df.agg(TextFunctions.misraGries(col("token"), capacity).as("s"))
      .select(explode(col("s")).as("c"))
      .select("c.token", "c.lb")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  private def exact(df: DataFrame): Map[String, Long] =
    df.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("capacity >= distinct keys: lower bounds are the exact counts") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("token").repartition(3)
    assert(sketch(df, 16) === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("MG guarantee under skew: heavy items survive with bounded-error lower bounds") {
    val truth = exact(skewed)
    val n = truth.values.sum
    for (parts <- Seq(1, 4, 13)) {
      val got = sketch(skewed.repartition(parts), 32)
      assert(got.size <= 32)
      val maxErr = n / 33 // N / (capacity + 1)
      // every item with freq > N/(c+1) must be present
      truth.filter(_._2 > maxErr).keys.foreach { k =>
        assert(got.contains(k), s"heavy item $k lost at parts=$parts")
      }
      // every emitted lb is a lower bound within the MG error
      got.foreach { case (k, lb) =>
        val t = truth(k)
        assert(lb <= t && t - lb <= maxErr,
          s"bound violated for $k at parts=$parts: lb=$lb true=$t maxErr=$maxErr")
      }
    }
  }

  test("two-pass refine recovers the exact top-k despite capacity << vocabulary") {
    val toks = skewed.repartition(7)
    val cands = toks
      .agg(TextFunctions.misraGries(col("token"), 32).as("s"))
      .select(explode(col("s")).as("c"))
      .select(col("c.token").as("token"))
    val refined = toks.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = (5 to 1 by -1).map(i => (s"heavy_$i", i * 1000L))
    assert(refined === expected)
  }

  test("property: bounds hold on random zipf-ish streams at random widths/capacities") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      nKeys <- Gen.choose(5, 200)
      // zipf-ish: key i appears ~ ceil(nKeys / i) times
      capacity <- Gen.choose(2, 24)
      parts <- Gen.choose(1, 9)
      salt <- Gen.choose(0, 1000)
    } yield (nKeys, capacity, parts, salt)
    val prop = Prop.forAllNoShrink(gen) { case (nKeys, capacity, parts, salt) =>
      val rows = (1 to nKeys).flatMap(i =>
        Seq.fill(math.ceil(nKeys.toDouble / i).toInt)(f"k${(i + salt) % nKeys}%04d"))
      val df = rows.toDF("token").repartition(parts)
      val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = rows.size
      val maxErr = n / (capacity + 1)
      val got = sketch(df, capacity)
      got.size <= capacity &&
        truth.forall { case (k, c) => c <= maxErr || got.contains(k) } &&
        got.forall { case (k, lb) => lb <= truth(k) && truth(k) - lb <= maxErr }
    }
    val result = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("eval order is deterministic: (lb desc, token asc)") {
    val df = Seq("b", "a", "b", "a", "c").toDF("token")
    val rows = df.agg(TextFunctions.misraGries(col("token"), 8).as("s"))
      .select(explode(col("s")).as("c")).select("c.token").as[String].collect()
    assert(rows.toSeq === Seq("a", "b", "c"))
  }
}
