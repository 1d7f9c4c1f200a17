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

  private def segDirs(path: String): Seq[String] =
    new java.io.File(s"$path/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("seg=")).toSeq

  test("many-batch append keeps the live segment count bounded and the gate unchanged") {
    val path = freshIndex()
    val maxSegments = 8
    // 25 tiny single-ish-doc batches — the streaming-ingest worst case for
    // small-file/segment accumulation
    val ids = batchA.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).grouped(5).toSeq
    ids.foreach { g =>
      BandIndex.append(path, batchA.filter(col("doc_id").isin(g: _*)),
        col("doc_id"), col("text"), maxSegments = maxSegments)
    }
    val live = graft.sources.SegmentedTable.readManifest(spark, path).segments
    assert(live.length <= maxSegments,
      s"append must self-compact: ${live.length} live segments > maxSegments=$maxSegments")
    // compaction retains superseded segments for in-flight readers; vacuum
    // (writer-only) reclaims them and must not touch what is served
    assert(segDirs(path).length > live.length,
      "superseded segments must be retained until vacuum")
    BandIndex.vacuum(spark, path)
    assert(segDirs(path).map(_.drop("seg=".length).toLong).sorted === live.sorted,
      "vacuum must leave exactly the manifest-named segments")
    // neither compaction nor vacuum changes WHAT is indexed: gate equals
    // the recompute over history ∪ everything appended
    val persisted = BandIndex.gate(path, batchB, col("doc_id"), col("text"))
    val recompute = Dedup.incrementalNearDupFilter(
      batchB, history.unionByName(batchA), col("doc_id"), col("text"), nh, bands, k)
    assert(rowSet(persisted) === rowSet(recompute))
  }

  test("a crashed append (segment staged, manifest not flipped) is invisible " +
      "and the retried batch lands exactly once") {
    val path = freshIndex()
    val before = rowSet(BandIndex.bands(spark, path))
    // simulate the crash window: the batch's segment directory exists under
    // bands/ but the manifest never named it — stage it EXACTLY as append
    // would (same version allocation), then "crash" before the flip by
    // never writing the manifest
    val m = graft.sources.SegmentedTable.readManifest(spark, path)
    Dedup.minhashBands(batchA, col("doc_id"), col("text"), nh, bands, k)
      .write.mode("overwrite")
      .parquet(graft.sources.SegmentedTable.segDir(s"$path/bands", m.version + 1))
    assert(rowSet(BandIndex.bands(spark, path)) === before,
      "an orphan (unpublished) segment must be invisible to readers")
    // the retry overwrites the orphan at the same version and publishes it
    BandIndex.append(path, batchA, col("doc_id"), col("text"))
    val after = rowSet(BandIndex.bands(spark, path))
    assert(after === rowSet(Dedup.minhashBands(
      history.unionByName(batchA), col("doc_id"), col("text"), nh, bands, k)),
      "the retried append must land the batch exactly once")
    // and the orphan never becomes visible later: vacuum reclaims nothing
    // that is live, gate keeps serving the published snapshot
    BandIndex.vacuum(spark, path)
    assert(rowSet(BandIndex.bands(spark, path)) === after)
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

  test("delete makes the gate forget a doc: its near-duplicate is admitted " +
      "again, and compaction + vacuum erase the bands") {
    import spark.implicits._
    // controlled corpus: two docs with fully disjoint vocabularies, so doc
    // 0's bands are the ONLY thing that can gate its lookalike
    val tiny = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("band-index-del").toString
    BandIndex.build(tiny, col("doc_id"), col("text"), nh, bands, k, path)
    // a doc sharing every shingle with indexed doc 0 gates out...
    val dup = tiny.filter(col("doc_id") === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    assert(BandIndex.gate(path, dup, col("doc_id"), col("text")).isEmpty,
      "an exact near-dup of an indexed doc must be rejected before the delete")
    // ...until the corpus forgets doc 0
    BandIndex.delete(spark, path, Seq(0L).toDF("doc_id"))
    assert(!BandIndex.gate(path, dup, col("doc_id"), col("text")).isEmpty,
      "after deleting the indexed doc its lookalike must be admitted")
    assert(BandIndex.bands(spark, path)
      .filter(col("doc_id") === 0).isEmpty, "tombstoned bands must not read")
    // re-ingesting the deleted doc re-indexes it (new segment > del_v)
    BandIndex.append(path, tiny.filter(col("doc_id") === 0),
      col("doc_id"), col("text"))
    assert(!BandIndex.bands(spark, path)
      .filter(col("doc_id") === 0).isEmpty, "re-ingested doc must be live")
    assert(BandIndex.gate(path, dup, col("doc_id"), col("text")).isEmpty,
      "the re-ingested doc gates its lookalike again")
    // erase a second doc for the physical-removal leg
    BandIndex.delete(spark, path, Seq(2L).toDF("doc_id"))
    BandIndex.compact(spark, path)
    BandIndex.vacuum(spark, path)
    val remaining = spark.read.parquet(s"$path/bands")
      .select("doc_id").as[Long].collect().toSet
    assert(!remaining.contains(2L),
      "compaction + vacuum must physically erase the tombstoned bands")
    assert(remaining.contains(0L), "the re-ingested doc survives the rewrite")
  }
}
