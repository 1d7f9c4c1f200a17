package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.sources.SegmentedTable

/** The ONE ingest-maintenance sequence every cluster-partitioned vector
  * index uses ([[IvfIndex.append]], [[IvfAdc.append]]), factored so the
  * contract cannot drift between them — the
  * [[graft.sources.SegmentedTable]] manifest protocol specialized to
  * `seg=<v>/cluster=<c>/` data:
  *
  *  1. screen ids — in-batch dedup (an at-least-once upstream can fold a
  *     redelivery into ONE micro-batch, invisible to the anti-join) plus a
  *     left-anti join against the PERSISTED live ids, reading only the
  *     column-pruned id projection — so any retry/redelivery lands exactly
  *     once. INSERT-ONLY by construction: a row whose id already exists is
  *     dropped, NOT updated — re-embedding an existing id requires a
  *     rebuild (segments are immutable; there is no in-place delete), and
  *     callers that need refresh semantics must version ids;
  *  2. encode + stage the batch as an INVISIBLE `seg=<v>/` segment (its
  *     own `cluster=` partitions inside) — a crash before the publish
  *     leaves an inert orphan that the retry overwrites (same version
  *     allocation), never a torn table;
  *  3. publish with one atomic manifest flip;
  *  4. self-compact once the live segment count exceeds `maxSegments`:
  *     rewrite the live segments into one (one file per cluster) and flip.
  *     `maxSegments` is the rewrite-amortization knob — each compaction
  *     rewrites the whole table, and the threshold admits ~maxSegments
  *     batches between rewrites, during which a probed cluster pays at
  *     most one small-file read per live segment (the appends' default is
  *     16). Superseded segments are RETAINED for in-flight readers until
  *     the writer vacuums ([[SegmentedTable.vacuum]]).
  *
  * Single WRITER per index (appends/compactions/vacuums serialize); a
  * reader's manifest pins a complete immutable snapshot, so serves are
  * safe against concurrent appends until the writer vacuums.
  */
private[operators] object IndexIngest {

  /** Manifest-extras key naming the live TOMBSTONE segment versions (under
    * `$root/deletes/seg=<v>/`, each a parquet of (vec_id, del_v) rows —
    * `del_v` is the manifest version AT deletion, so a tombstone masks
    * exactly the data rows published in segments ≤ del_v and a later
    * RE-append of the same id (a data segment > del_v) is visible without
    * touching the ledger; a plain id-set ledger would resurrect the OLD
    * physical row the moment the id was cleared for the new one). Carried
    * on every publish so appends cannot silently drop deletions; cleared
    * by [[compact]], which physically removes the masked rows. */
  private[operators] val TombstoneKey = "tombstone_segs"

  private def tombstoneSegs(m: SegmentedTable.Manifest): Seq[Long] =
    m.extras.get(TombstoneKey).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).map(_.toLong)

  private def deletesDir(root: String) = s"$root/deletes"

  /** The live tombstone ledger (id, del_v) under `m`, if any. */
  private def tombstones(spark: SparkSession, root: String,
      m: SegmentedTable.Manifest): Option[DataFrame] = {
    val segs = tombstoneSegs(m)
    if (segs.isEmpty) None
    else Some(SegmentedTable.read(spark, deletesDir(root),
      m.copy(segments = segs)).select("id", "del_v"))
  }

  /** Apply `m`'s tombstone ledger to a seg-carrying read of the index's
    * data (broadcast anti-join, id-equi-keyed with the `seg ≤ del_v`
    * masking condition; the ledger is bounded by deletes-since-last-
    * compaction) and drop `seg`. Shared by the cluster-partitioned
    * indexes' [[readLive]] and [[BandIndex]]'s flat band table, so the
    * masking semantics cannot drift between them. */
  def maskTombstones(spark: SparkSession, root: String,
      m: SegmentedTable.Manifest, data: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    tombstones(spark, root, m).fold(data)(t =>
      data.join(broadcast(t.withColumnRenamed("id", "__tomb_id")),
        col(idCol) === col("__tomb_id") &&
          col("seg").cast("long") <= col("del_v"), "left_anti"))
      .drop("seg")
  }

  /** Live rows of the index's data table under an already-read manifest —
    * one manifest-pinned scan with the tombstone ledger applied; static
    * `seg IN` pruning composes with the caller's own partition filters
    * and dynamic pruning on `cluster`. */
  private def readLiveUnder(spark: SparkSession, root: String,
      dataName: String, m: SegmentedTable.Manifest): DataFrame =
    maskTombstones(spark, root, m,
      SegmentedTable.readKeepSeg(spark, s"$root/$dataName", m), "vec_id")

  def readLive(spark: SparkSession, root: String, dataName: String): DataFrame =
    readLiveUnder(spark, root, dataName,
      SegmentedTable.readManifest(spark, root))

  /** Logical delete — the right-to-be-forgotten maintenance path: stage
    * the ids as a tombstone segment (each stamped with the current
    * manifest version, see [[TombstoneKey]]) and publish ATOMICALLY with
    * the unchanged data-segment list (one manifest flip — a reader sees
    * the deletion entirely or not at all). Serving and the append id
    * screen exclude masked rows immediately; the bytes are physically
    * removed at the next [[compact]] (which also clears the ledger), so
    * "deleted" becomes "erased" on the compaction cadence — run one after
    * a deletion deadline, then [[vacuum]] to reclaim the superseded
    * segments that still hold the bytes. Deleting an absent id is a
    * no-op; a deleted id may be RE-appended afterwards (the screen no
    * longer sees it, and the new row's segment version exceeds the
    * tombstone's del_v, so only the OLD row stays masked). WRITER-ONLY,
    * serialized with append/compact/vacuum. Note: raw
    * [[graft.sources.SegmentedTable.readAt]] time travel is
    * data-segment-level and does NOT apply the ledger — current-state
    * reads must go through [[readLive]] (all index serve paths do). */
  def delete(spark: SparkSession, root: String, dataName: String,
      ids: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val m = SegmentedTable.readManifest(spark, root)
    // screen against the LIVE (already-masked) rows: absent and
    // already-deleted ids are no-ops, so a retried/replayed deletion batch
    // publishes nothing instead of growing the ledger per replay — the
    // same idempotency-by-screen contract as appendScreened (the
    // column-pruned id scan is the cost of a rare maintenance op)
    val hit = ids.select(col(idCol).as("id")).dropDuplicates("id")
      .join(maskTombstones(spark, root, m,
          SegmentedTable.readKeepSeg(spark, s"$root/$dataName", m), idCol)
        .select(col(idCol).as("id")), Seq("id"), "left_semi")
      .localCheckpoint(eager = true) // one screen feeds the probe + write
    if (!hit.isEmpty) {
      val v = m.version + 1
      hit.withColumn("del_v", lit(m.version))
        .write.mode(SaveMode.Overwrite)
        .parquet(SegmentedTable.segDir(deletesDir(root), v))
      val segs = (tombstoneSegs(m) :+ v).mkString(",")
      SegmentedTable.writeManifest(spark, root,
        SegmentedTable.Manifest(v, m.segments,
          m.extras + (TombstoneKey -> segs)))
    }
  }

  def appendScreened(spark: SparkSession, root: String, dataName: String,
      batch: DataFrame, idCol: String, encode: DataFrame => DataFrame,
      maxSegments: Int): Unit = {
    require(maxSegments >= 2, s"maxSegments must be >= 2, got $maxSegments")
    val dataDir = s"$root/$dataName"
    val m = SegmentedTable.readManifest(spark, root)
    // screen against the TOMBSTONE-FILTERED live ids: a deleted id must be
    // re-insertable (the whole point of erasure is that the index forgets
    // it — including in the dedup screen)
    val fresh = batch.dropDuplicates(idCol).join(
      readLiveUnder(spark, root, dataName, m).select(idCol),
      Seq(idCol), "left_anti")
    val v = m.version + 1
    val segDir = SegmentedTable.segDir(dataDir, v)
    encode(fresh)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(segDir)
    // a fully-screened batch (replay, in-batch dups only) stages an EMPTY
    // segment — a partitioned write of zero rows lands no data files.
    // Publishing it would grow the live list per replay and, worse, tick
    // the compaction threshold: a stream of replays would trigger a
    // pointless whole-table rewrite every maxSegments batches. Skip the
    // flip (the dir is inert either way — unpublished, and the next
    // append's Overwrite at the same version wipes it).
    val fs = new org.apache.hadoop.fs.Path(segDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listFiles(new org.apache.hadoop.fs.Path(segDir), true)
    var hasRows = false
    while (!hasRows && staged.hasNext)
      hasRows = staged.next().getPath.getName.endsWith(".parquet")
    if (hasRows)
      // extras carried verbatim: the tombstone ledger survives appends (a
      // re-added id's NEW row is visible anyway — its segment version
      // exceeds every tombstone's del_v)
      SegmentedTable.writeManifest(spark, root,
        SegmentedTable.Manifest(v, m.segments :+ v, m.extras))
    // the bound is enforced even on a skipped (empty) publish: a caller
    // tightening maxSegments must see the index compacted by its next
    // append, whatever that batch contains
    if (m.segments.length + (if (hasRows) 1 else 0) > maxSegments)
      compact(spark, root, dataName)
  }

  /** Rewrite the live segments into ONE — clustering the shuffle on the
    * partition column puts each cluster's rows in one writer task, so the
    * compacted segment lands exactly one file per cluster (the
    * serve-optimal shape for an index whose reads always scan whole
    * probed clusters; parquet row groups keep a single large file
    * read-parallel) — and publish it with a manifest flip. The rewrite
    * materializes the TOMBSTONE-FILTERED view and clears the ledger:
    * logically-deleted rows are physically erased here (the GDPR "erase"
    * step — superseded segments still hold the bytes until the writer
    * vacuums, which completes the erasure). */
  def compact(spark: SparkSession, root: String, dataName: String): Unit = {
    val dataDir = s"$root/$dataName"
    val m = SegmentedTable.readManifest(spark, root)
    val v = m.version + 1
    readLiveUnder(spark, root, dataName, m)
      .repartition(org.apache.spark.sql.functions.col("cluster"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cluster")
      .parquet(SegmentedTable.segDir(dataDir, v))
    SegmentedTable.writeManifest(spark, root,
      SegmentedTable.Manifest(v, Seq(v), m.extras - TombstoneKey))
  }

  /** Reclaim segment dirs the current manifest does not name — the data
    * table's via [[SegmentedTable.vacuum]], plus tombstone-ledger segments
    * the live `tombstone_segs` list no longer references (superseded by an
    * append's ledger rewrite, cleared by a compaction, or orphaned by a
    * crash). WRITER-ONLY, serialized with append/compact/delete. */
  def vacuum(spark: SparkSession, root: String, dataName: String,
      retainSnapshots: Int = 1): Unit = {
    val retained =
      SegmentedTable.vacuum(spark, root, s"$root/$dataName", retainSnapshots)
    // ledger segments referenced by ANY retained snapshot stay (a
    // time-travel-retained version's masking must keep working)
    val live = retained.flatMap(tombstoneSegs).toSet
    val dir = new org.apache.hadoop.fs.Path(deletesDir(root))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("seg=")) {
        val s = n.drop("seg=".length)
        if (s.nonEmpty && s.forall(_.isDigit) && !live.contains(s.toLong))
          fs.delete(p, true)
      }
    }
  }
}
