package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.functions.TextFunctions.tokens
import graft.sources.SegmentedTable

/** Persisted inverted index — the LEXICAL sibling of [[IvfIndex]]: the
  * build-then-serve form of the `tx_bm25` full-scan scorer. The recompute
  * form tokenizes and scores the ENTIRE corpus per query; here the posting
  * lists are the index — (term, doc_id, tf, dl) rows partitioned by a hash
  * bucket of the term, so serving a query reads ONLY the partitions its
  * terms hash into (partition pruning on `term_bucket`, spec-asserted)
  * instead of the corpus: at 100 TB the non-queried vocabulary is never
  * scanned, not merely filtered.
  *
  * Layout choices, each load-bearing at scale:
  *  - `term_bucket = pmod(xxhash64(term), buckets)` partitions: a raw
  *    `partitionBy(term)` would create one directory per vocabulary entry
  *    (millions of tiny dirs — a listing storm); hash-sharding bounds the
  *    directory count while keeping per-term reads pruned to one bucket.
  *  - `dl` (the document's token count) is DENORMALIZED onto every posting
  *    row: BM25 needs each candidate's length, and a separate doclen table
  *    would force a corpus-sized join against the pruned posting read —
  *    8 bytes/row buys a join-free serve.
  *  - df(term) is NOT stored: it is exactly the posting-list length, and
  *    the serve recomputes it from rows it reads anyway — a stored df
  *    table would be a second artifact that could drift from the postings.
  *
  * INCREMENTAL MAINTENANCE — the [[graft.sources.SegmentedTable]]
  * manifest protocol shared by every persisted index here. Each segment
  * spans TWO artifact families under one version (`postings/seg=<N>/`
  * partitioned by `term_bucket` inside, plus the matching `ids/seg=<N>/`
  * doc-id ledger), both named by ONE `manifest` file that also carries
  * the corpus stats as EXACT integers in its extras (n_docs, dl_sum,
  * dl_count — integer sums of integer values are bit-exact in any order,
  * so avgdl = dl_sum / dl_count is identical whether the corpus arrived
  * in one build or a thousand appends). `append` stages the new segment
  * dirs INVISIBLY, then publishes segments + merged stats with one
  * atomic manifest rename — postings and stats can never be observed out
  * of step, the failure a two-artifact update would otherwise race (the
  * [[graft.warehouse.AtomicCommit]] manifest idea, specialized to the
  * index). A crash before the rename leaves orphan dirs the retry
  * overwrites; the doc-id ledger (which includes docs whose null text
  * yields no postings) makes the retry's anti-join screen exactly-once.
  * Compaction is just another manifest flip: rewrite the live segments
  * into one and publish; superseded dirs are RETAINED so serves holding
  * the previous manifest keep reading a complete snapshot, and an
  * explicit [[vacuum]] reclaims unreferenced dirs after the deployment's
  * retention window (a crash anywhere leaves inert orphans, never a torn
  * table — strictly safer than a rename-swap of a live directory). With
  * `seg` as a partition column the live postings are ONE scan relation:
  * the `seg IN (live)` filter and the query terms' `term_bucket IN (…)`
  * filter are both foldable partition predicates, pruned together at
  * file listing.
  *
  * `meta/` pins (buckets, a build id) BEFORE the artifacts and `commit/`
  * seals the same id AFTER them — the [[graft.sources.BuildStamp]]
  * torn-REBUILD protocol shared by every persisted index here: bucket keys
  * are only comparable under the stored bucket count, so a torn rebuild
  * fails every later serve loudly instead of probing wrong buckets.
  * Single WRITER per index (append/compact race nothing but themselves);
  * serves are safe against a concurrent append (old manifest = old
  * complete snapshot) for as long as the superseded segments are retained
  * — i.e. until the writer [[vacuum]]s — and never against a concurrent
  * REBUILD. A writer that also vacuums (the streaming sink does, at
  * micro-batch starts) shrinks the retention window to its batch cadence;
  * serve from a quiesced index when that window is too small.
  */
object LexIndex {

  private def bucketOf(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets.toLong))

  private def readManifest(spark: SparkSession, path: String): SegmentedTable.Manifest =
    SegmentedTable.readManifest(spark, path)

  /** Exact-integer corpus stats carried in the manifest extras. */
  private def stats(m: SegmentedTable.Manifest): (Long, Long, Long) =
    (m.extras("n_docs").toLong, m.extras("dl_sum").toLong,
      m.extras("dl_count").toLong)

  private def manifestOf(version: Long, segments: Seq[Long],
      nDocs: Long, dlSum: Long, dlCount: Long,
      carry: Map[String, String] = Map.empty): SegmentedTable.Manifest =
    SegmentedTable.Manifest(version, segments, carry ++ Map(
      "n_docs" -> nDocs.toString, "dl_sum" -> dlSum.toString,
      "dl_count" -> dlCount.toString))

  /** The non-stats extras a publish must carry forward (today: the
    * tombstone-ledger list — dropping it would resurrect deleted docs). */
  private def carried(m: SegmentedTable.Manifest): Map[String, String] =
    m.extras.view.filterKeys(
      !Set("n_docs", "dl_sum", "dl_count").contains(_)).toMap

  /** The live postings — ONE scan of `postings/` with the foldable
    * `seg IN (live)` partition filter and the tombstone ledger applied
    * ([[IndexIngest.maskTombstones]]); the caller's bucket/term filters
    * compose with it on the same relation. df recomputes from this masked
    * read, so deletion corrects df automatically — only the corpus-level
    * stats need the explicit adjustment [[delete]] performs. */
  private def livePostings(spark: SparkSession, path: String,
      m: SegmentedTable.Manifest): DataFrame =
    IndexIngest.maskTombstones(spark, path, m,
      SegmentedTable.readKeepSeg(spark, s"$path/postings", m), "doc_id")

  private def liveIds(spark: SparkSession, path: String,
      m: SegmentedTable.Manifest): DataFrame =
    IndexIngest.maskTombstones(spark, path, m,
      SegmentedTable.readKeepSeg(spark, s"$path/ids", m), "doc_id")

  /** (doc_id, dl, term, tf, term_bucket) posting rows for a (doc_id, text)
    * frame — THE one tokenize+count definition build and append share. */
  private def postingsOf(docs: DataFrame, buckets: Int): DataFrame =
    Parallelism.fanOut(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("parts"))
      .select(col("doc_id"), size(col("parts")).as("dl"),
        explode(col("parts")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("int").as("tf"))
      .withColumn("term_bucket", bucketOf(col("term"), buckets))

  /** Stage one segment's postings + id-ledger dirs (invisible until the
    * manifest names them; `Overwrite` so a retry wipes a crashed
    * predecessor's leftovers at the same version). The ledger carries each
    * doc's token count (`dl`, null for null text) so [[delete]] can
    * subtract the doc's exact stats contribution without scanning
    * postings. */
  private def writeSegment(docs: DataFrame, path: String, buckets: Int,
      version: Long): Unit = {
    postingsOf(docs, buckets)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("term_bucket")
      .parquet(SegmentedTable.segDir(s"$path/postings", version))
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"))
      .write.mode(SaveMode.Overwrite)
      .parquet(SegmentedTable.segDir(s"$path/ids", version))
  }

  /** Build segment v0 + manifest + the meta/commit stamp pair. `doc_id`
    * must be UNIQUE — duplicate ids would score once here but twice in the
    * full-scan scorer the serve is spec-pinned to, so build fails loudly
    * (the check rides the stats aggregate, not a dedicated pass). The
    * input must be DETERMINISTIC under re-scan (a table read, not an
    * unordered limit/sample): stats, postings, and the id ledger are three
    * scans of the same plan, and checkpointing a 100 TB corpus between
    * them would cost more than the build itself. */
  def build(docs: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val input = docs.select(col("doc_id"), col("text"))
    val r = input.agg(count(lit(1)),
      sum(size(tokens(col("text"))).cast("long")),
      count(tokens(col("text"))), countDistinct(col("doc_id"))).head()
    require(r.getLong(0) == r.getLong(3),
      "LexIndex.build requires unique doc_ids — duplicates would merge " +
        "into one posting and silently drift from the full-scan scorer")
    val buildId = graft.sources.BuildStamp.newId()
    Seq((buckets, buildId)).toDF("buckets", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    // version past any directory an earlier generation of this index left
    // behind: a rebuild's segment must never collide with a retained one
    val v =
      if (SegmentedTable.manifestExists(spark, path))
        SegmentedTable.readManifest(spark, path).version + 1
      else 0L
    writeSegment(input, path, buckets, v)
    SegmentedTable.writeManifest(spark, path, manifestOf(v, Seq(v),
      r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2)))
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  private def params(spark: SparkSession, path: String): Int = {
    val metaRow = spark.read.parquet(s"$path/meta").head()
    graft.sources.BuildStamp.requireCommitted(spark, path, metaRow, "lexical index")
    metaRow.getAs[Int]("buckets")
  }

  /** Append new documents WITHOUT rebuilding: screen ids against the
    * ledger (in-batch dedup + anti-join — a batch retried after a crash,
    * or redelivered even within one batch, lands exactly once; INSERT-ONLY
    * like every index append here, an edited doc needs a rebuild), write
    * the segment dirs invisibly, then publish segments + merged stats with
    * the one atomic manifest rename. Steady-state cost: tokenize the
    * BATCH + one column-pruned ledger read — never a history re-scan.
    * Self-compacts once the live segment count exceeds `maxSegments`
    * (each serve reads every live segment's pruned buckets, so unbounded
    * appends would degrade the serve into a many-dir listing storm). */
  def append(spark: SparkSession, path: String, docs: DataFrame,
      maxSegments: Int = 16): Unit = {
    require(maxSegments >= 2)
    val buckets = params(spark, path)
    val m = readManifest(spark, path)
    val (nDocs, dlSum, dlCount) = stats(m)
    // persist (not localCheckpoint): one screen computation feeds the
    // stats job and both segment writes, and the blocks are RELEASED after
    // the publish — a long-lived writer looping over micro-batches must
    // not accumulate executor storage per append. The in-batch dedup is
    // min(text) per id, NOT dropDuplicates: persist can recompute lost
    // blocks through lineage, and an arbitrary-row dedup recomputed
    // differently would silently write postings disagreeing with the stats
    // already counted — the deterministic pick makes recompute harmless.
    val fresh = docs.select(col("doc_id"), col("text"))
      .groupBy("doc_id").agg(min(col("text")).as("text"))
      .join(liveIds(spark, path, m), Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val liveSegments =
      try {
        val r = fresh.agg(count(lit(1)),
          sum(size(tokens(col("text"))).cast("long")),
          count(tokens(col("text"))), count(col("doc_id"))).head()
        val n = r.getLong(0)
        // a NULL doc_id never matches the ledger's anti-join (null = null
        // is null), so it would be re-ingested on EVERY append — the one
        // id the exactly-once screen cannot screen. Fail before anything
        // is written.
        require(n == r.getLong(3),
          "LexIndex.append requires non-null doc_ids — a null id escapes " +
            "the ledger screen and would re-ingest on every replay")
        if (n > 0) {
          val v = m.version + 1
          writeSegment(fresh, path, buckets, v)
          SegmentedTable.writeManifest(spark, path,
            manifestOf(v, m.segments :+ v, nDocs + n,
              dlSum + (if (r.isNullAt(1)) 0L else r.getLong(1)),
              dlCount + r.getLong(2), carried(m)))
        }
        // the post-publish segment list is already in hand — no manifest
        // re-read (2-3 metadata RPCs per micro-batch on an object store)
        m.segments.length + (if (n > 0) 1 else 0)
      } finally fresh.unpersist(blocking = true)
    // compact AFTER the batch blocks are released (the unpersist BLOCKS —
    // async removal would let the rewrite overlap the still-pinned batch):
    // the whole-index rewrite is the most memory-hungry moment of the
    // append loop
    if (liveSegments > maxSegments) compact(spark, path)
  }

  /** Rewrite the live segments into ONE and publish it with a manifest
    * flip — no live-directory rename swap, so there is no torn-swap crash
    * window at all. Superseded segment dirs are RETAINED: an in-flight
    * serve constructed from the previous manifest still reads a complete
    * immutable snapshot (the property the class doc promises). Reclaim
    * them with [[vacuum]] once no reader can hold a pre-compaction
    * manifest. */
  def compact(spark: SparkSession, path: String): Unit = {
    params(spark, path) // validates the build stamp before touching artifacts
    val m = readManifest(spark, path)
    val (nDocs, dlSum, dlCount) = stats(m)
    val v = m.version + 1
    livePostings(spark, path, m)
      .repartition(col("term_bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("term_bucket")
      .parquet(SegmentedTable.segDir(s"$path/postings", v))
    liveIds(spark, path, m)
      .write.mode(SaveMode.Overwrite)
      .parquet(SegmentedTable.segDir(s"$path/ids", v))
    // the rewrite materialized the tombstone-filtered views above (the
    // GDPR "erase" step — deleted docs' postings are physically gone from
    // the new segment), so the ledger is cleared with the same flip
    SegmentedTable.writeManifest(spark, path,
      manifestOf(v, Seq(v), nDocs, dlSum, dlCount,
        carried(m) - IndexIngest.TombstoneKey))
  }

  /** Logical delete of documents by id — the BM25 serve forgets them
    * IMMEDIATELY and EXACTLY: the masked posting read corrects df (df is
    * recomputed from rows read, the no-drift property the class doc pins),
    * and this method subtracts the deleted docs' exact-integer stats
    * contributions (each doc's `dl` comes from the ledger, no postings
    * scan), so the served ranking is bit-equal to an index built from the
    * surviving corpus alone. One atomic manifest flip publishes tombstones
    * + adjusted stats together. Bytes are physically erased at the next
    * [[compact]]; a deleted id may be re-appended (versioned tombstones —
    * see [[IndexIngest.delete]]). Deleting an absent or already-deleted id
    * is a no-op. WRITER-ONLY. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    params(spark, path) // torn-rebuild check before mutating
    val m = readManifest(spark, path)
    val (nDocs, dlSum, dlCount) = stats(m)
    // only currently-live docs affect the stats (absent / already-deleted
    // ids must be no-ops); the join also fetches each doc's ledger dl
    val hit = ids.select(col("doc_id")).dropDuplicates("doc_id")
      .join(liveIds(spark, path, m), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val r = hit.agg(count(lit(1)), sum(col("dl")), count(col("dl"))).head()
      val n = r.getLong(0)
      if (n > 0) {
        val v = m.version + 1
        hit.select(col("doc_id").as("id"))
          .withColumn("del_v", lit(m.version))
          .write.mode(SaveMode.Overwrite)
          .parquet(SegmentedTable.segDir(s"$path/deletes", v))
        val tombSegs = (m.extras.get(IndexIngest.TombstoneKey).toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty) :+ v.toString).mkString(",")
        SegmentedTable.writeManifest(spark, path,
          manifestOf(v, m.segments, nDocs - n,
            dlSum - (if (r.isNullAt(1)) 0L else r.getLong(1)),
            dlCount - r.getLong(2),
            carried(m) + (IndexIngest.TombstoneKey -> tombSegs)))
      }
    } finally hit.unpersist(blocking = true)
  }

  /** Delete every segment dir the current manifest does NOT name —
    * compaction leftovers and crash orphans — in BOTH artifact families.
    * WRITER-ONLY, serialized with append/compact; see
    * [[SegmentedTable.vacuum]]. Run it from the single writer's own
    * context between appends (the streaming sink does exactly this), and
    * only once in-flight readers of older manifests are done (the
    * retention window is the deployment's choice, exactly like any
    * snapshot store's vacuum). */
  def vacuum(spark: SparkSession, path: String, retainSnapshots: Int = 1): Unit = {
    // postings + tombstone ledger via the shared index vacuum, then the
    // second artifact family (the id ledger) by the same manifest
    IndexIngest.vacuum(spark, path, "postings", retainSnapshots)
    SegmentedTable.vacuum(spark, path, s"$path/ids", retainSnapshots)
    ()
  }

  /** BM25 top-k (k1=1.2, b=0.75, Lucene-style idf — the `tx_bm25`
    * constants) for a bag of query `terms` against the persisted index.
    * Returns (doc_id, bm25 rounded 4dp), score DESC with doc_id tiebreak —
    * bit-equal to the full-scan `bm25Scores` ranking over the same corpus
    * REGARDLESS of how it arrived (one build or many appends: the stats
    * are exact integers, posting rows are identical either way):
    * per-doc contributions fold in sorted-term order, which matches the
    * scorer's alphabetical-term fold because a zero-tf term contributes
    * exactly +0.0.
    *
    * Scan shape: the query terms' bucket partitions (across the live
    * segments) are read TWICE — once for the per-term df aggregate
    * (map-side partial counts, a |terms|-row shuffle, broadcast back) and
    * once for scoring. The deliberate alternative, deriving df with a
    * count window partitioned by term over one read, would funnel each
    * term's ENTIRE posting list through a single window task — a common
    * term at corpus scale is a straight OOM hotspot, far worse than
    * re-reading the pruned buckets. The per-doc score is one keyed
    * aggregate over posting rows (candidate docs only — never the corpus)
    * and the top-k compiles to TakeOrderedAndProject.
    *
    * Consistency is checked at CONSTRUCTION (meta + manifest read);
    * execution of the returned lazy frame races a concurrent REBUILD like
    * any Spark read of mutable storage (a concurrent append is safe — the
    * captured manifest names a complete immutable snapshot). */
  def searchTopK(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty)
    val buckets = params(spark, path)
    val m = readManifest(spark, path)
    val wanted = terms.distinct
    import spark.implicits._
    // evaluate the terms' bucket keys up front (a |terms|-row local job):
    // LITERAL bucket values make the partition filter foldable, so the
    // pruning is static file listing, not a runtime filter over all buckets
    val wantedBuckets = wanted.toDF("term")
      .select(bucketOf(col("term"), buckets).as("b"))
      .distinct().as[Long].collect().toSeq
    def posts = livePostings(spark, path, m)
      .filter(col("term_bucket").isin(wantedBuckets: _*)
        && col("term").isin(wanted: _*))
    val df = posts.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val (mDocs, mDlSum, mDlCount) = stats(m)
    val nDocs = lit(mDocs.toDouble)
    val avgdl =
      if (mDlCount == 0L) lit(null).cast("double")
      else lit(mDlSum.toDouble / mDlCount.toDouble)
    val contrib = posts
      .join(broadcast(df), "term")
      .select(col("doc_id"),
        struct(col("term"),
          graft.functions.TextFunctions.bm25Contribution(
            col("tf").cast("double"), col("dl").cast("double"),
            col("df"), nDocs, avgdl).as("c")).as("tc"))
    contrib.groupBy("doc_id")
      .agg(round(aggregate(array_sort(collect_list(col("tc"))),
        lit(0.0), (acc, x) => acc + x.getField("c")), 4).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
