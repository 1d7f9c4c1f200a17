package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "source", "text")
  private lazy val target = docs.filter(col("source").isin("src1", "src2"))

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("dsir-model").toString
    DsirModel.build(target, col("text"), docs, col("text"), p)
    p
  }

  test("scoring against the persisted model equals the recompute path") {
    val served = DsirModel.score(path, docs, col("doc_id"), col("text"))
    val recompute = Dsir.importanceScores(docs, col("doc_id"), col("text"),
      Dsir.bucketLogRatios(target, col("text"), docs, col("text")))
    assert(rowSet(served) === rowSet(recompute))
    assert(served.count() === docs.count(),
      "every non-null-text doc must get a score row")
  }

  test("a NEW batch (outside the training pool) scores under the stored " +
      "model without re-reading the pool; out-of-model tokens add 0") {
    import spark.implicits._
    // two disjoint dialects: target = the wiki half of the pool, so wiki
    // tokens are RELATIVELY overrepresented in target (positive ratio),
    // web tokens underrepresented (negative), and never-seen tokens hit no
    // trained bucket (score exactly 0, row still guaranteed)
    val wiki = "astronomy orbital stellar physics galaxy nebula quasar frame"
    val web = "click buy offer discount deal subscribe cheap today"
    val pool = (0L until 20L).map(i =>
        (i, if (i < 10) wiki else web)).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("dsir-model-syn").toString
    DsirModel.build(pool.filter(col("doc_id") < 10), col("text"),
      pool, col("text"), p)
    val batch = Seq(
      (900001L, wiki),
      (900002L, web),
      (900003L, "zzqx1 zzqx2 zzqx3 zzqx4 zzqx5 zzqx6 zzqx7 zzqx8")
    ).toDF("doc_id", "text")
    val scored = DsirModel.score(p, batch, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(scored.keySet === Set(900001L, 900002L, 900003L))
    assert(scored.values.forall(_._2 === 8L),
      "n_tokens counts every token, in-model or not")
    assert(scored(900003L)._1 === 0.0,
      "a doc with only out-of-model tokens scores exactly 0")
    assert(scored(900001L)._1 > 0.0 && scored(900002L)._1 < 0.0,
      s"target dialect must score positive, pool-only dialect negative: $scored")
  }

  test("gate keeps exactly the at-or-above-threshold docs with their columns") {
    val scores = DsirModel.score(path, docs, col("doc_id"), col("text"))
    // median-ish cut so the fixture exercises both sides of the gate
    val cut = scores.orderBy(desc("score"), col("doc_id"))
      .limit(100).orderBy(col("score")).limit(1)
      .collect().head.getDouble(1)
    val kept = DsirModel.gate(path, docs, col("doc_id"), col("text"), cut)
    assert(kept.columns.toSeq === docs.columns.toSeq,
      "gate must pass the input columns through untouched")
    val expect = docs.join(
      scores.filter(col("score") >= cut).select("doc_id"), Seq("doc_id"), "left_semi")
    assert(rowSet(kept) === rowSet(expect))
    assert(kept.count() > 0 && kept.count() < docs.count(),
      "fixture must keep some docs and drop others")
  }

  test("a torn rebuild (meta written, commit marker missing) fails loudly") {
    val p = java.nio.file.Files.createTempDirectory("dsir-model-torn").toString
    DsirModel.build(target, col("text"), docs, col("text"), p)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/commit"), true)
    val err = intercept[IllegalArgumentException] {
      DsirModel.score(p, docs, col("doc_id"), col("text")).collect()
    }
    assert(err.getMessage.contains("TORN"))
  }
}
