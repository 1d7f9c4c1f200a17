package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted tokenizer must serve bit-equal to direct segmentation
  * under the training-time table, survive the torn-rebuild protocol, and
  * keep token counts comparable within one generation. */
class BpeModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text").filter(col("doc_id") < 200)

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("bpe-model").toString
    BpeModel.build(docs, col("text"), p, nMerges = 6)
    p
  }

  test("tokenize under stored rules equals direct segmentText under the " +
      "training-time table") {
    val direct = BpeTrainer.train(docs, col("text"), nMerges = 6)
      .orderBy("rank").select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val served = BpeModel.tokenize(path, docs, col("text"))
      .select(col("doc_id"), col("tokens"))
    val want = docs.select(col("doc_id"),
      BpeTrainer.segmentText(col("text"), direct).as("tokens"))
    assert(rowSet(served) === rowSet(want))
    assert(served.count() === docs.count())
  }

  test("the stored table passes the BPE merge contract and meta pins provenance") {
    assert(BpeTrainer.contractViolations(BpeModel.rules(spark, path)).isEmpty)
    val meta = spark.read.parquet(s"$path/meta").head()
    assert(meta.getAs[Long]("n_docs") === docs.count())
    assert(meta.getAs[Int]("n_merges") === 6)
  }

  test("fertility reports tokens-per-word per doc; empty docs are NULL not error") {
    val f = BpeModel.fertility(path, docs, col("doc_id"), col("text"))
    assert(f.filter(col("n_words") > 0)
      .filter(abs(col("fertility") -
        col("n_tokens").cast("double") / col("n_words").cast("double")) > 1e-6)
      .isEmpty)
    // merges only ever REDUCE the symbol count vs character splitting:
    // fertility under any table is <= the character count per word
    assert(f.filter(col("fertility") < 1.0).isEmpty,
      "a word is at least one token")
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val fe = BpeModel.fertility(path, empty, col("doc_id"), col("text"))
    assert(rowSet(fe) === Seq("[1,0,0,null]"))
  }

  test("a torn rebuild (crash between meta and commit) fails loudly") {
    val p = java.nio.file.Files.createTempDirectory("bpe-torn").toString
    import spark.implicits._
    Seq((1L, 4, "orphan-build"))
      .toDF("n_docs", "n_merges", "build_id")
      .coalesce(1).write.parquet(s"$p/meta")
    BpeTrainer.train(docs, col("text"), 2)
      .coalesce(1).write.parquet(s"$p/rules")
    val e = intercept[IllegalArgumentException] {
      BpeModel.rules(spark, p).collect()
    }
    assert(e.getMessage.contains("bpe model"))
  }
}
