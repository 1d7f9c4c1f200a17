package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LexIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text")
  private val terms = Seq("dup", "vector", "window")

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("lexindex").toString
    LexIndex.build(docs, p, buckets = 16)
    p
  }

  test("serving from the posting lists equals the full-scan tx_bm25 ranking") {
    val served = LexIndex.searchTopK(spark, path, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = graft.Registry.byName("tx_bm25").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === full,
      "pruned posting-list serve must rank bit-equal to the full-scan scorer")
    assert(served.nonEmpty)
  }

  test("the posting scan is pruned to the query terms' buckets") {
    val df = LexIndex.searchTopK(spark, path, terms, k = 20)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // static partition pruning: the scan must carry a term_bucket filter
    // (foldable literals, not a runtime subquery) and the term pushdown
    assert(plan.contains("term_bucket"), s"no bucket pruning in plan:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"term filter must reach the posting scan:\n$plan")
    // the pruned read must touch at most |distinct buckets of terms| of the
    // 16 partition dirs — inspect the scan node's selected partitions
    // directly (the AQE plan string doesn't render PartitionCount)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(scans)
    }
    val postingScans = scans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
    assert(postingScans.nonEmpty, s"no postings scan found in plan:\n$plan")
    postingScans.foreach(s =>
      assert(s.selectedPartitions.partitionCount <= terms.length,
        s"scan read ${s.selectedPartitions.partitionCount} bucket partitions for " +
          s"${terms.length} terms:\n$plan"))
  }

  test("append: build(A) + append(B) serves BIT-EQUAL to build(A∪B); " +
      "replay and in-batch dups land exactly once; compaction is invariant") {
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300)
    val incr = java.nio.file.Files.createTempDirectory("lex_incr").toString
    val full = java.nio.file.Files.createTempDirectory("lex_full").toString
    LexIndex.build(a, incr, buckets = 16)
    LexIndex.append(spark, incr, b.unionByName(b)) // in-batch dup folded in
    LexIndex.build(docs, full, buckets = 16)
    def top(p: String) = LexIndex.searchTopK(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(incr) === top(full),
      "incrementally-built index must serve bit-equal to the one-shot build")
    // replay: a redelivered batch publishes nothing new
    LexIndex.append(spark, incr, b)
    assert(top(incr) === top(full), "a replayed append must change nothing")
    // compaction: results unchanged, and a serve CONSTRUCTED BEFORE the
    // compaction (old manifest) must still execute — superseded segments
    // are retained for in-flight readers until an explicit vacuum
    val inFlight = LexIndex.searchTopK(spark, incr, terms, k = 20)
    LexIndex.compact(spark, incr)
    assert(top(incr) === top(full), "compaction must not change results")
    assert(inFlight.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === top(full), "an in-flight pre-compaction serve must still read")
    // vacuum reclaims everything the current manifest does not name
    LexIndex.vacuum(spark, incr)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(incr), spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$incr/postings"))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
    assert(segs.length === 1,
      s"vacuum must leave only the live segment, got ${segs.toSeq}")
    assert(top(incr) === top(full), "vacuum must not change results")
    // an orphan segment dir (crash between segment write and manifest
    // publish) is invisible to the serve
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$incr/postings/seg=999"))
    assert(top(incr) === top(full), "unpublished segments must be invisible")
    // a null doc_id cannot be screened by the ledger anti-join — append
    // must refuse it before writing anything
    import spark.implicits._
    val err = intercept[IllegalArgumentException] {
      LexIndex.append(spark, incr,
        Seq((java.lang.Long.valueOf(9999L), "fresh doc"),
          (null.asInstanceOf[java.lang.Long], "null id doc"))
          .toDF("doc_id", "text"))
    }
    assert(err.getMessage.contains("non-null doc_ids"))
    assert(top(incr) === top(full), "a refused append must write nothing")
  }

  test("append past maxSegments self-compacts to bounded live segments") {
    val p = java.nio.file.Files.createTempDirectory("lex_selfc").toString
    LexIndex.build(docs.filter(col("doc_id") < 100), p, buckets = 8)
    (0 until 4).foreach { i =>
      LexIndex.append(spark, p,
        docs.filter(col("doc_id") >= 100 + i * 50 && col("doc_id") < 150 + i * 50),
        maxSegments = 2)
    }
    LexIndex.vacuum(spark, p) // reclaim superseded (retained) segments
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings"))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
    assert(segs.length <= 2,
      s"self-compaction must bound live segments, got ${segs.toSeq}")
    // and the maintained index still matches the one-shot build
    val full = java.nio.file.Files.createTempDirectory("lex_selfc_full").toString
    LexIndex.build(docs.filter(col("doc_id") < 300), full, buckets = 8)
    val got = LexIndex.searchTopK(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = LexIndex.searchTopK(spark, full, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("property: any random split into sequential appends serves bit-equal " +
      "to the one-shot build") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val corpus = docs.filter(col("doc_id") < 200)
    val oneShot = java.nio.file.Files.createTempDirectory("lex_prop_full").toString
    LexIndex.build(corpus, oneShot, buckets = 8)
    val want = LexIndex.searchTopK(spark, oneShot, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val gen = for {
      nCuts <- Gen.choose(1, 4)
      cuts <- Gen.listOfN(nCuts, Gen.choose(1L, 199L))
    } yield (0L +: cuts.distinct.sorted :+ 200L).distinct
    val prop = Prop.forAllNoShrink(gen) { bounds =>
      val p = java.nio.file.Files.createTempDirectory("lex_prop").toString
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        val slice = corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
        if (i == 0) LexIndex.build(slice, p, buckets = 8)
        else LexIndex.append(spark, p, slice)
      }
      val got = LexIndex.searchTopK(spark, p, terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      got == want
    }
    val result = check(Parameters.default.withMinSuccessfulTests(3), prop)
    assert(result.passed, result.status.toString)
  }

  test("build rejects duplicate doc_ids instead of silently merging them") {
    val p = java.nio.file.Files.createTempDirectory("lexindex_dup").toString
    // deterministic duplicate: id 0 appears twice (two independent
    // unordered limit()s are NOT guaranteed to overlap)
    val dup = docs.filter(col("doc_id") < 20)
      .unionByName(docs.filter(col("doc_id") === 0))
    val err = intercept[IllegalArgumentException] {
      LexIndex.build(dup, p, buckets = 4)
    }
    assert(err.getMessage.contains("unique doc_ids"))
  }

  test("a query term absent from the corpus contributes nothing and breaks nothing") {
    val served = LexIndex.searchTopK(spark, path, terms :+ "zzz_nonexistent", k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val base = LexIndex.searchTopK(spark, path, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served === base)
  }

  test("a torn rebuild (meta written, commit marker missing) fails loudly") {
    val p = java.nio.file.Files.createTempDirectory("lexindex_torn").toString
    LexIndex.build(docs.filter(col("doc_id") < 50), p, buckets = 4)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/commit"), true)
    val err = intercept[IllegalArgumentException] {
      LexIndex.searchTopK(spark, p, terms, k = 5)
    }
    assert(err.getMessage.contains("TORN"))
  }

  test("delete(B) serves BIT-EQUAL to an index never containing B (df and " +
      "avgdl both corrected); re-append restores; compaction erases") {
    import spark.implicits._
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300)
    def top(p: String) = LexIndex.searchTopK(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // full index, then forget B
    val full = java.nio.file.Files.createTempDirectory("lex-del").toString
    LexIndex.build(docs, full, buckets = 16)
    LexIndex.delete(spark, full,
      b.select("doc_id"))
    // reference: an index that never saw B
    val onlyA = java.nio.file.Files.createTempDirectory("lex-a").toString
    LexIndex.build(a, onlyA, buckets = 16)
    assert(top(full) === top(onlyA),
      "post-delete serve must be bit-equal to an index built without the " +
        "deleted docs — masked postings fix df, adjusted stats fix avgdl")
    // deleting absent / already-deleted ids is a no-op (stats untouched)
    LexIndex.delete(spark, full,
      Seq(999999L).toDF("doc_id").unionByName(b.select("doc_id").limit(5)))
    assert(top(full) === top(onlyA))
    // a deleted doc is re-appendable and scores again
    LexIndex.append(spark, full, b)
    val rebuilt = java.nio.file.Files.createTempDirectory("lex-ab").toString
    LexIndex.build(docs, rebuilt, buckets = 16)
    assert(top(full) === top(rebuilt),
      "re-appending the deleted docs must restore the full-corpus ranking")
    // physical erasure: forget B again, compact, vacuum — B's postings
    // exist in no remaining file and the serve is still the A ranking
    LexIndex.delete(spark, full, b.select("doc_id"))
    LexIndex.compact(spark, full)
    LexIndex.vacuum(spark, full)
    assert(top(full) === top(onlyA))
    val remaining = spark.read.parquet(s"$full/postings")
      .select("doc_id").as[Long].collect().toSet
    assert(remaining.forall(_ < 300),
      "compaction + vacuum must physically erase the deleted docs' postings")
    val fs = new org.apache.hadoop.fs.Path(full)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deletesDir = new org.apache.hadoop.fs.Path(s"$full/deletes")
    assert(!fs.exists(deletesDir) || fs.listStatus(deletesDir).isEmpty,
      "vacuum must reclaim every superseded tombstone segment")
  }
}
