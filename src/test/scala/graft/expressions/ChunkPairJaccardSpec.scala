package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential pin for the fused prefix-refine kernel: the
  * [[ChunkPairJaccard]]-based [[graft.operators.Dedup.prefixFilterPairs]]
  * must return exactly the pairs + jaccards of the UNFUSED reference
  * (candidate join + array attach + merge-walk as separate DataFrame
  * steps) on real corpus text, across thresholds — the round-14 rewrite
  * changed the execution shape (no per-pair rows before the survivor
  * explode), provably not the result. */
class ChunkPairJaccardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The unfused reference: exact all-pairs jaccard over sorted shingle
    * sets (small corpus only — the point is independence from the prefix
    * machinery, not scale). */
  private def reference(threshold: Double): Seq[String] = {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val sets = docs
      .select(col("doc_id"),
        sort_array(graft.functions.TextFunctions.shingles(col("text"), 2))
          .as("sh"))
      .filter(size(col("sh")) > 0)
    val pairs = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
    val i = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
    rowSet(pairs
      .withColumn("i", i)
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard")))
  }

  test("fused prefixFilterPairs ≡ brute-force jaccard join on real corpus " +
      "text, across thresholds (exact recall — the prefix filter's claim)") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    for (t <- Seq(0.5, 0.8)) {
      val got = rowSet(graft.operators.Dedup.prefixFilterPairs(
        docs, col("doc_id"), col("text"), threshold = t))
      val want = reference(t)
      assert(got === want, s"pair/jaccard set diverged at threshold $t")
      assert(want.nonEmpty, s"fixture has no near-dup pairs at $t — " +
        "the differential would be vacuous")
    }
  }

  test("expression edge cases: diagonal excludes self/backward pairs, " +
      "cross-chunk emits all admissible pairs, empty survivors allowed") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val itemT = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("rn", IntegerType, nullable = false),
      StructField("shh", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val schema = StructType(Seq(
      StructField("ba", ArrayType(itemT, containsNull = false)),
      StructField("bb", ArrayType(itemT, containsNull = false)),
      StructField("diag", BooleanType, nullable = false)))
    def item(id: Long, shh: Seq[Long], rn: Int = 1) =
      Row(id, shh.length, rn, shh.sorted)
    val a1 = item(1L, Seq(10L, 20L))
    val a2 = item(2L, Seq(10L, 20L))
    val far = item(3L, Seq(99L))
    val rows = java.util.Arrays.asList(
      Row(Seq(a1, a2), Seq(a1, a2), true), // diagonal: only (1,2)
      Row(Seq(a1), Seq(a2, far), false), // cross: (1,2) qualifies, (1,3) not
      Row(Seq(far), Seq(far), true)) // diagonal singleton: nothing
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(explode(org.apache.spark.sql.GraftBridge.column(
        ChunkPairJaccard(
          org.apache.spark.sql.GraftBridge.expression(col("ba")),
          org.apache.spark.sql.GraftBridge.expression(col("bb")),
          org.apache.spark.sql.GraftBridge.expression(col("diag")),
          0.5))).as("r"))
      .select(col("r.doc_a"), col("r.doc_b"))
      .collect().map(_.toString).sorted.toSeq
    assert(out === Seq("[1,2]", "[1,2]"),
      s"unexpected emissions: $out")
  }

  test("hash screen never under-counts: an intra-doc hash collision can " +
      "only raise the screen Jaccard (lossless screen contract)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val itemT = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("rn", IntegerType, nullable = false),
      StructField("shh", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val schema = StructType(Seq(
      StructField("ba", ArrayType(itemT, containsNull = false)),
      StructField("bb", ArrayType(itemT, containsNull = false)),
      StructField("diag", BooleanType, nullable = false)))
    // doc 1 holds two DISTINCT shingles that collided to hash 7; doc 2
    // holds one shingle with hash 7: true string Jaccard could be as low
    // as 1/3 but the multiset hash walk reports min(2,1)=1 of (3+1-1)=1/3
    // — and with doc 2 = {7,7} the screen sees 2/2 ≥ true — both pass a
    // 0.3 screen, neither is dropped
    val rows = java.util.Arrays.asList(
      Row(Seq(Row(1L, 3, 1, Seq(7L, 7L, 9L))),
        Seq(Row(2L, 2, 1, Seq(7L, 7L))), false))
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(explode(org.apache.spark.sql.GraftBridge.column(
        ChunkPairJaccard(
          org.apache.spark.sql.GraftBridge.expression(col("ba")),
          org.apache.spark.sql.GraftBridge.expression(col("bb")),
          org.apache.spark.sql.GraftBridge.expression(col("diag")),
          0.3))).as("r"))
      .select(col("r.doc_a"), col("r.doc_b")).collect()
    assert(out.length === 1, "collision pair must survive the screen")
  }
}
