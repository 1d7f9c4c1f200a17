package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def sic(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  test("merge-walk count ≡ size(array_intersect) on real corpus shingle " +
      "pairs (the refine-step differential pin)") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"),
        sort_array(TextFunctions.shingles(col("text"), 2)).as("sh"))
      .limit(60)
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
    val rows = pairs.select(
        sic(col("sh_a"), col("sh_b")).as("walk"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("ref"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("tot"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("uni"))
      .collect()
    assert(rows.length > 1000)
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "intersect count mismatch")
      // the union identity the refine relies on (distinct sets only)
      assert(r.getLong(3) === r.getLong(2) - r.getLong(0),
        "|A∪B| != |A|+|B|-|A∩B| — inputs were not distinct sets")
    }
  }

  // the expression requires containsNull = false (the analysis-time
  // null-element rejection), which `toDF`'s encoder never produces —
  // build the fixture with an explicit schema, the producer-shaped type
  private def noNullArrays(rows: Seq[(Seq[String], Seq[String], Long)])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("b", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("want", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      schema)
  }

  test("edge cases: empty, disjoint, identical, subset, null") {
    def arr(xs: String*): Seq[String] = xs.sorted
    val df = noNullArrays(Seq(
      (arr(), arr("a"), 0L),
      (arr("a", "b"), arr("c", "d"), 0L),
      (arr("a", "b", "c"), arr("a", "b", "c"), 3L),
      (arr("a", "b", "c", "d"), arr("b", "d"), 2L),
      (arr("x"), arr(), 0L)))
    df.select(sic(col("a"), col("b")).as("got"), col("want")).collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val nul = noNullArrays(Seq((null, arr("a"), 0L)))
      .select(sic(col("a"), col("b")).as("got")).collect()
    assert(nul.head.isNullAt(0), "null input must yield null")
  }

  test("containsNull = true inputs are rejected at analysis (null elements " +
      "would NPE the merge walk)") {
    val df = Seq((Seq("a"), Seq("a"))).toDF("a", "b") // encoder: containsNull=true
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(sic(col("a"), col("b"))).queryExecution.analyzed
    }
    assert(e.getMessage.contains("containsNull"))
  }
}
