package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "want")
    df.select(cosineRounded(col("a"), col("b")).as("got"), col("want"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("dot accumulates in document order as double") {
    val got = Seq((Seq(0.5f, 0.25f, 2.0f), Seq(2.0f, 4.0f, 0.5f)))
      .toDF("a", "b").select(dot(col("a"), col("b")).as("d"))
      .as[Double].collect()(0)
    assert(got == 3.0)
  }
}
