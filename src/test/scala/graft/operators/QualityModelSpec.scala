package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class QualityModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text")

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("quality-model").toString
    QualityModel.build(docs, col("text"), p)
    p
  }

  test("scoring against the persisted model equals the recompute path") {
    val label = TextFunctions.gateRules(col("text")).map(_._2).reduce(_ && _)
    val served = QualityModel.score(path, docs, col("text"))
    val recompute = QualityClassifier.classify(docs,
      QualityClassifier.train(docs,
        QualityClassifier.marginFeatures(col("text")), label),
      QualityClassifier.marginFeatures(col("text")))
    assert(rowSet(served) === rowSet(recompute))
    assert(served.count() === docs.count(),
      "every doc must get a score row")
  }

  test("a NEW batch scores under the stored weights without re-reading " +
      "the training snapshot; gate passes columns through") {
    import spark.implicits._
    val batch = Seq(
      // inside every gate band and stopword-bearing: the model must keep it
      (900001L, "the data of the system and the plan in the cache of the run " +
        "read the keys and the rows in the scan to the sink and the merge"),
      // two tokens: hard length-rule violation — the model must drop it
      (900002L, "tiny doc")
    ).toDF("doc_id", "text")
    val scored = QualityModel.score(path, batch, col("text"))
      .select("doc_id", "kept")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(scored(900001L), "a clearly-in-band doc must be kept")
    assert(!scored(900002L), "a hard length violation must be dropped")
    val kept = QualityModel.gate(path, batch, col("text"))
    assert(kept.columns.toSeq === batch.columns.toSeq,
      "gate must pass the input columns through untouched")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq ===
      Seq(900001L))
  }

  test("meta pins the training provenance") {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    assert(meta.getAs[Long]("n_docs") === docs.count())
    assert(meta.getAs[Int]("iters") === 40)
    assert(meta.getAs[Double]("lr") === 4.0)
  }

  test("a torn rebuild (meta written, commit marker missing) fails loudly") {
    val p = java.nio.file.Files.createTempDirectory("quality-model-torn").toString
    QualityModel.build(docs, col("text"), p)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/commit"), true)
    val err = intercept[IllegalArgumentException] {
      QualityModel.score(p, docs, col("text")).collect()
    }
    assert(err.getMessage.contains("TORN"))
  }
}
