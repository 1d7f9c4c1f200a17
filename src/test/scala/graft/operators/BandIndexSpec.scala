package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BandIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text")
  // history = even ids, batches = two disjoint odd-id slices
  private lazy val history = docs.filter(col("doc_id") % 2 === 0)
  private lazy val batchA = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 250)
  private lazy val batchB = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") >= 250)
  private val (nh, bands, k) = (16, 4, 2)

  private def freshIndex(): String = {
    val p = java.nio.file.Files.createTempDirectory("band-index").toString
    BandIndex.build(history, col("doc_id"), col("text"), nh, bands, k, p)
    p
  }

  test("gate over the persisted index equals the recompute path") {
    val path = freshIndex()
    val persisted = BandIndex.gate(path, batchA, col("doc_id"), col("text"))
    val recompute = Dedup.incrementalNearDupFilter(
      batchA, history, col("doc_id"), col("text"), nh, bands, k)
    assert(rowSet(persisted) === rowSet(recompute))
    assert(persisted.count() > 0, "fixture must leave some survivors")
    assert(persisted.count() < batchA.count(), "fixture must reject some docs")
  }

  test("append-then-gate equals recompute over history ∪ appended batch") {
    val path = freshIndex()
    BandIndex.append(path, batchA, col("doc_id"), col("text"))
    val persisted = BandIndex.gate(path, batchB, col("doc_id"), col("text"))
    val recompute = Dedup.incrementalNearDupFilter(
      batchB, history.unionByName(batchA), col("doc_id"), col("text"), nh, bands, k)
    assert(rowSet(persisted) === rowSet(recompute))
  }

  test("gate/append take MinHash parameters from the index meta, not the caller") {
    // an index built with DIFFERENT parameters must screen differently from
    // the (nh, bands, k) recompute — proving gate read meta/ rather than
    // defaulting to anything
    val p = java.nio.file.Files.createTempDirectory("band-index-alt").toString
    BandIndex.build(history, col("doc_id"), col("text"),
      numHashes = 32, bands = 16, shingleK = 3, path = p)
    val alt = BandIndex.gate(p, batchA, col("doc_id"), col("text"))
    val base = Dedup.incrementalNearDupFilter(
      batchA, history, col("doc_id"), col("text"), numHashes = 32, bands = 16,
      shingleK = 3)
    assert(rowSet(alt) === rowSet(base),
      "gate must derive batch bands with the INDEX's parameters")
  }

  test("ingest returns the survivors and indexes them: re-gating the same batch rejects all shingleable docs") {
    val path = freshIndex()
    val survivors = BandIndex.ingest(path, batchA, col("doc_id"), col("text"))
    val direct = Dedup.incrementalNearDupFilter(
      batchA, history, col("doc_id"), col("text"), nh, bands, k)
    assert(rowSet(survivors) === rowSet(direct))
    // every survivor's own bands are now indexed, so a second pass over the
    // same batch can only let through docs that produce NO bands at all
    val regated = BandIndex.gate(path, batchA, col("doc_id"), col("text"))
    val bandless = batchA.join(
      Dedup.minhashBands(batchA, col("doc_id"), col("text"), nh, bands, k)
        .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    assert(rowSet(regated) === rowSet(bandless))
  }

  test("many-batch append keeps the file count bounded and the gate unchanged") {
    val path = freshIndex()
    val maxFiles = 8
    // 25 tiny single-ish-doc batches — the streaming-ingest worst case for
    // small-file accumulation
    val ids = batchA.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).grouped(5).toSeq
    ids.foreach { g =>
      BandIndex.append(path, batchA.filter(col("doc_id").isin(g: _*)),
        col("doc_id"), col("text"), maxFiles = maxFiles)
    }
    val bandFiles = new java.io.File(s"$path/bands").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(bandFiles <= maxFiles,
      s"append must self-compact: $bandFiles files > maxFiles=$maxFiles")
    // compaction must not change WHAT is indexed: gate equals the recompute
    // over history ∪ everything appended
    val persisted = BandIndex.gate(path, batchB, col("doc_id"), col("text"))
    val recompute = Dedup.incrementalNearDupFilter(
      batchB, history.unionByName(batchA), col("doc_id"), col("text"), nh, bands, k)
    assert(rowSet(persisted) === rowSet(recompute))
  }

  test("a torn rebuild (meta written, bands/commit stale) fails loudly at the gate") {
    val path = freshIndex()
    import spark.implicits._
    // simulate a rebuild that died after meta/ but before commit/: new
    // build_id in meta, old one still in commit
    Seq((nh, bands, k, "torn-rebuild-id"))
      .toDF("num_hashes", "bands", "shingle_k", "build_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val e = intercept[IllegalArgumentException] {
      BandIndex.gate(path, batchA, col("doc_id"), col("text")).collect()
    }
    assert(e.getMessage.contains("TORN"))
    intercept[IllegalArgumentException] {
      BandIndex.append(path, batchA, col("doc_id"), col("text"))
    }
  }

  test("the gate's history side reads ONLY the band columns from the index") {
    val path = freshIndex()
    val plan = BandIndex.gate(path, batchA, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    val indexScans = plan.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("band-index")).toSeq
    assert(indexScans.nonEmpty, s"expected a parquet scan of the index:\n$plan")
    assert(indexScans.forall(l => !l.contains("doc_id")),
      s"index scan must prune doc_id (screen needs only band, band_key):\n$indexScans")
  }
}
