package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SketchFunctions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], k: Int, parts: Int = 4): Seq[Long] =
    values.toDF("v").repartition(parts)
      .agg(kmvSketch(col("v"), k).as("sk"))
      .as[Seq[Long]].head()

  test("small groups are exact: sketch = all distinct hashes, ascending") {
    val sk = sketchOf(Seq(1L, 2L, 3L, 2L, 1L), k = 16)
    assert(sk.length === 3, "duplicates must collapse inside the buffer")
    assert(sk === sk.sorted, "positions must be ascending")
  }

  test("sketch is partitioning-invariant (merge = set union, no order effects)") {
    val values = (1L to 5000L).map(i => i % 1733) // duplicates + spread
    val a = sketchOf(values, k = 64, parts = 1)
    val b = sketchOf(values, k = 64, parts = 13)
    val c = sketchOf(values, k = 64, parts = 32)
    assert(a === b)
    assert(a === c)
  }

  test("distinct estimate is exact under k and within ~3/sqrt(k) over it") {
    val k = 256
    val under = sketchOf((1L to 200L), k)
    assert(kmvEstimate(under, k) === 200.0)
    val n = 20000
    val over = sketchOf((1L to n.toLong), k)
    val est = kmvEstimate(over, k)
    assert(math.abs(est - n) / n <= 3.0 / math.sqrt(k),
      s"distinct estimate $est vs $n")
  }

  private def kmvEstimate(sk: Seq[Long], k: Int): Double =
    Seq(sk).toDF("sk").select(kmvDistinct(col("sk"), k).as("d"))
      .as[Double].head()

  test("jaccard estimate: exact for small sets, bounded error for large") {
    val k = 256
    def jac(a: Seq[Long], b: Seq[Long]): Double = {
      val skA = sketchOf(a, k)
      val skB = sketchOf(b, k)
      Seq((skA, skB)).toDF("a", "b")
        .select(kmvJaccard(col("a"), col("b"), k).as("j"))
        .as[Double].head()
    }
    // small: both sets fit inside k -> exact
    assert(jac(1L to 100L, 51L to 150L) === (50.0 / 150.0))
    // large: |A|=|B|=10k, |A∩B|=5k -> J = 1/3, tolerance ~3/sqrt(k)
    val j = jac(1L to 10000L, 5001L to 15000L)
    assert(math.abs(j - 1.0 / 3.0) <= 3.0 / math.sqrt(k), s"jaccard $j")
  }

  test("intersection estimate: exact for small sets, bounded error for large") {
    val k = 256
    def inter(a: Seq[Long], b: Seq[Long]): Double = {
      val skA = sketchOf(a, k)
      val skB = sketchOf(b, k)
      Seq((skA, skB)).toDF("a", "b")
        .select(kmvIntersect(col("a"), col("b"), k).as("i"))
        .as[Double].head()
    }
    // small: the union fits inside k -> jaccard and union size are both
    // exact, so the product is the true intersection (up to fp rounding)
    assert(math.abs(inter(1L to 100L, 51L to 150L) - 50.0) < 1e-9)
    // large: |A|=|B|=10k, |A∩B|=5k; both factors carry ~3/sqrt(k) error,
    // so the product is held to the combined relative bound
    val est = inter(1L to 10000L, 5001L to 15000L)
    val relTol = 3.0 / math.sqrt(k) * (1.0 / (1.0 / 3.0)) + 3.0 / math.sqrt(k)
    assert(math.abs(est - 5000.0) / 5000.0 <= relTol, s"intersect $est")
  }

  test("string keys hash and sketch identically across partitionings") {
    val values = (1 to 3000).map(i => s"user-${i % 997}")
    def sk(parts: Int) = values.toDF("v").repartition(parts)
      .agg(kmvSketch(col("v"), 64).as("sk")).as[Seq[Long]].head()
    assert(sk(1) === sk(17))
  }

  test("plan: sketch build is one ObjectHashAggregate, no corpus shuffle by key") {
    val df = (1L to 1000L).toDF("v")
      .groupBy(col("v") % 3).agg(kmvSketch(col("v"), 32))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
