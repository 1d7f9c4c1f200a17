package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Manifest-versioned segmented parquet table — the ONE maintenance
  * protocol every persisted index's mutable artifact uses
  * ([[graft.operators.BandIndex]] bands, [[graft.operators.IvfIndex]]
  * corpus, [[graft.operators.IvfAdc]] codes; [[graft.operators.LexIndex]]
  * carries the same protocol with sibling-root segment dirs because each of
  * its segments spans TWO artifact families — see its class doc).
  *
  * Layout: every segment is a `seg=<version>/` partition directory under
  * the single data root, so the whole table — however many appends and
  * compactions produced it — is ONE scan relation: the live-segment filter
  * is a foldable `seg IN (…)` partition predicate (static file pruning, no
  * per-segment union), and any further partition columns inside a segment
  * (e.g. `cluster=`) keep their own static and DYNAMIC partition pruning
  * exactly as in an unsegmented table. (The union-of-sibling-roots
  * alternative is rejected for partitioned data: Spark's partition
  * discovery refuses sibling `…-vN` roots in one multi-path read, and a
  * per-segment union would put every probe join above a Union node.)
  *
  * Publication: a writer stages a new segment INVISIBLY (the manifest does
  * not name its version — readers' seg filter excludes it even though it
  * lives under the data root), then publishes it with one atomic manifest
  * rename. Readers see the old or the new manifest, never a partial state,
  * so there is NO torn-swap crash window anywhere in the protocol: a crash
  * before the flip leaves an inert orphan directory that the next writer
  * OVERWRITES (version allocation is `manifest.version + 1`, so any
  * directory already at that version is by definition uncommitted garbage)
  * and [[vacuum]] reclaims. Compaction is just another flip: rewrite the
  * live segments into one new segment and publish it as the sole live
  * segment; superseded directories are RETAINED so an in-flight reader
  * holding the previous manifest keeps reading a complete immutable
  * snapshot, until the writer [[vacuum]]s after the deployment's retention
  * window.
  *
  * Single WRITER per table (appends/compactions/vacuums serialize with
  * each other — they race nothing but themselves); readers are safe
  * against a concurrent append or compaction (their manifest pins a
  * complete snapshot) for as long as superseded segments are retained,
  * and never against a concurrent REBUILD (the
  * [[graft.sources.BuildStamp]] meta/commit pair makes a torn rebuild
  * fail loudly instead of silently).
  */
object SegmentedTable {

  /** The live state: `segments` are the versions a reader may scan;
    * `version` is the newest ever published (the allocator for the next
    * staged segment); `extras` carries index-specific exact-integer stats
    * (e.g. LexIndex-style corpus counters) that must flip atomically WITH
    * the segment list. */
  case class Manifest(version: Long, segments: Seq[Long],
      extras: Map[String, String] = Map.empty)

  private val Reserved = Set("version", "segments")

  private def manifestPath(root: String) = new Path(s"$root/manifest")

  private def snapshotPath(root: String, version: Long) =
    new Path(s"$root/manifest.v$version")

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def manifestExists(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(manifestPath(root))

  /** Atomic publish: write to `manifest.tmp`, then FileContext-rename with
    * OVERWRITE onto `manifest` — the same primitive
    * [[graft.warehouse.AtomicCommit]] uses; readers see the old or the new
    * file, never a partial one. Additionally retains an IMMUTABLE
    * per-version snapshot copy (`manifest.v<version>`, written BEFORE the
    * live flip so a published version always has its snapshot) — the
    * time-travel ledger [[readAt]] resolves: since superseded segments are
    * retained until [[vacuum]], any snapshot whose segments still exist is
    * a complete, immutable historical view of the table. A crash between
    * snapshot and flip leaves an inert `manifest.v` for a version the live
    * manifest never named; the retrying writer overwrites it at the same
    * version, and [[vacuum]] reclaims it otherwise (unpublished versions
    * are by definition > the live manifest's). */
  def writeManifest(spark: SparkSession, root: String, m: Manifest): Unit = {
    require(m.extras.keySet.intersect(Reserved).isEmpty,
      s"extras may not shadow the reserved manifest keys $Reserved")
    val fs = fsOf(spark, root)
    val body =
      (s"version=${m.version}\nsegments=${m.segments.mkString(",")}\n" +
        m.extras.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v\n" }.mkString)
        .getBytes("UTF-8")
    val snap = fs.create(snapshotPath(root, m.version), true)
    try snap.write(body) finally snap.close()
    val tmp = new Path(s"$root/manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(body)
    finally out.close()
    FileContext.getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, manifestPath(root), Options.Rename.OVERWRITE)
  }

  private def parseManifest(spark: SparkSession, p: Path): Manifest = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = body.linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    Manifest(kv("version").toLong,
      kv("segments").split(",").filter(_.nonEmpty).map(_.toLong).toSeq,
      kv.view.filterKeys(!Reserved(_)).toMap)
  }

  def readManifest(spark: SparkSession, root: String): Manifest = {
    require(fsOf(spark, root).exists(manifestPath(root)),
      s"segmented table at $root has no manifest — either the path is not " +
        "an index root or the index predates the manifest format; re-run " +
        "build to (re)create it")
    parseManifest(spark, manifestPath(root))
  }

  /** The manifest AS OF a historical published `version` — the time-travel
    * read of the snapshot ledger [[writeManifest]] retains. Fails loudly
    * when the snapshot file is gone (vacuumed past the retention window,
    * or a version that was never published). */
  def readManifestAt(spark: SparkSession, root: String, version: Long): Manifest = {
    require(fsOf(spark, root).exists(snapshotPath(root, version)),
      s"segmented table at $root has no snapshot for version $version — " +
        "either the version was never published or its manifest was " +
        "vacuumed past the retention window")
    val m = parseManifest(spark, snapshotPath(root, version))
    require(m.version == version,
      s"snapshot manifest.v$version at $root declares version ${m.version}")
    m
  }

  /** Time-travel read: the table's live rows AS OF published `version`.
    * Readable for as long as that version's segments are retained — i.e.
    * until the single writer [[vacuum]]s past it; a vacuumed snapshot
    * fails loudly here (every segment's existence is checked before the
    * scan) instead of silently returning the partial rows whose
    * directories happen to survive. */
  def readAt(spark: SparkSession, root: String, dataDir: String,
      version: Long): DataFrame = {
    val m = readManifestAt(spark, root, version)
    val fs = fsOf(spark, dataDir)
    val gone = m.segments.filterNot(v => fs.exists(new Path(segDir(dataDir, v))))
    require(gone.isEmpty,
      s"snapshot $version of $dataDir is no longer readable: segment(s) " +
        s"${gone.mkString(", ")} were vacuumed past the retention window")
    read(spark, dataDir, m)
  }

  /** The directory a segment's writer targets directly (`Overwrite` mode,
    * so a retry wipes a crashed predecessor's leftovers at the same
    * version). */
  def segDir(dataDir: String, version: Long): String =
    s"$dataDir/seg=$version"

  /** Live rows of the table under `m`: one scan of the data root with the
    * foldable `seg IN (live)` partition filter, `seg` dropped. Orphan
    * (staged-but-unpublished, or superseded-but-not-yet-vacuumed) segment
    * directories are pruned at file listing, never read.
    * [[readKeepSeg]] retains the `seg` column for readers that need each
    * row's publication version (the tombstone masking in
    * [[graft.operators.IndexIngest]]). */
  def readKeepSeg(spark: SparkSession, dataDir: String, m: Manifest): DataFrame = {
    require(m.segments.nonEmpty,
      s"segmented table at $dataDir has no live segments")
    // Int literals match the inferred partition type (seg values are dir
    // names; inference yields int), keeping the predicate a plain
    // partition-attribute IN — statically prunable at listing time.
    // Versions are Long in the manifest; past Int.MaxValue the inference
    // itself would flip to LongType and the toInt literals would silently
    // match nothing — fail loudly instead (2^31 appends away, but silent
    // partial reads are never an acceptable failure mode)
    require(m.segments.forall(v => v >= 0 && v <= Int.MaxValue),
      s"segment version exceeds Int range at $dataDir: ${m.segments}")
    spark.read.parquet(dataDir)
      .filter(col("seg").isin(m.segments.map(_.toInt): _*))
  }

  def read(spark: SparkSession, dataDir: String, m: Manifest): DataFrame =
    readKeepSeg(spark, dataDir, m).drop("seg")

  /** Delete every `seg=` directory the current manifest does NOT name —
    * compaction leftovers and crash orphans. WRITER-ONLY, serialized with
    * append/compact: a vacuum racing a writer would delete the segment the
    * writer has staged but not yet published. Call it from the single
    * writer's own context between appends, and only once in-flight readers
    * of older manifests are done (the retention window is the
    * deployment's choice, exactly like any snapshot store's vacuum). */
  /** Reclaim storage while keeping the newest `retainSnapshots` published
    * versions time-travel-readable (a Delta-style retention policy;
    * default 1 = the live version only, the minimal footprint). The keep
    * set is the UNION of the retained snapshots' segments — segment dirs
    * outside it are deleted, and every snapshot file that is not retained,
    * is an unpublished orphan (version > live: a crash between snapshot
    * and flip), or references a segment the deletion pass removed (it
    * would be silently partial) is pruned. Returns the retained snapshot
    * manifests, newest first (callers with SIDE ledgers keyed off manifest
    * extras — [[graft.operators.IndexIngest]]'s tombstones — prune those
    * against the same retained set). WRITER-ONLY, serialized with
    * append/compact/delete. */
  def vacuum(spark: SparkSession, root: String, dataDir: String,
      retainSnapshots: Int = 1): Seq[Manifest] = {
    require(retainSnapshots >= 1, "retainSnapshots must be >= 1")
    val current = readManifest(spark, root)
    val rootFs = fsOf(spark, root)
    val rootDir = new Path(root)
    val snapFiles =
      if (!rootFs.exists(rootDir)) Seq.empty
      else rootFs.listStatus(rootDir).map(_.getPath).toSeq.filter { p =>
        val n = p.getName
        n.startsWith("manifest.v") &&
          n.drop("manifest.v".length).nonEmpty &&
          n.drop("manifest.v".length).forall(_.isDigit)
      }
    val published = snapFiles.map(p => parseManifest(spark, p))
      .filter(_.version <= current.version)
      .sortBy(-_.version)
    // the live manifest is always retained even if its snapshot file is
    // somehow gone (pre-snapshot-format tables)
    val retained = (current +: published.filter(_.version != current.version))
      .take(retainSnapshots)
    val keep = retained.flatMap(_.segments).toSet
    val fs = fsOf(spark, dataDir)
    val dir = new Path(dataDir)
    if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("seg=")) {
        val v = n.drop("seg=".length)
        if (v.nonEmpty && v.forall(_.isDigit) && !keep.contains(v.toLong))
          fs.delete(p, true)
      }
    }
    val retainedVersions = retained.map(_.version).toSet
    snapFiles.foreach { p =>
      val v = p.getName.drop("manifest.v".length).toLong
      if (v != current.version) {
        val snap = parseManifest(spark, p)
        if (!retainedVersions.contains(v) ||
            snap.version > current.version ||
            !snap.segments.forall(keep.contains))
          rootFs.delete(p, false)
      }
    }
    retained
  }
}
