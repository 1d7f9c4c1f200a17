package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic star schema (TESTDATA.md): one parquet file per
  * table per scale-factor directory.
  *
  * Scale posture: these are plain columnar scans — callers `select` only the
  * columns they need and put filters early so Catalyst pushes both into the
  * parquet reader (`PushedFilters` / `ReadSchema` in `.explain`). At 100 TB
  * the same code reads a partitioned directory tree; nothing here assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-table cache, the same contract a catalog gives `spark.table`:
  // file listing + footer schema are read ONCE per (session, path,
  // content-fingerprint) and every later reference reuses the relation
  // (~70 ms per parquet re-resolve, paid by every query build otherwise —
  // across a 14-query headline pass that is seconds of pure re-listing).
  // The fingerprint ([[FileFingerprint]]: per file name + length + mtime +
  // md5 of the trailing 4 KiB, i.e. the parquet footer) means a REWRITTEN
  // table — even a same-length rewrite inside mtime granularity — misses
  // the cache and re-resolves: the cache only short-circuits
  // provably-identical re-reads, never staleness (the same no-stale
  // contract PipelineSpec pins for the dd_components memo). Entries are
  // plan objects (no data), keyed by (session, path) with the fingerprint
  // INSIDE the value: a rewritten table REPLACES its stale entry instead of
  // accumulating one dead plan per rewrite, so a long-lived session holds
  // at most one entry per table it reads.
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val fp = FileFingerprint.of(spark, path)
    cache.get((spark, path)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = read(spark, dir, name)
        cache.put((spark, path), (fp, df))
        df
    }
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Fixture generations have stored `ts` differently: TIMESTAMP(NANOS)
      // (which Spark's parquet reader rejects — read the nanos as long via
      // nanosAsLong and truncate to micros) or plain TIMESTAMP(MICROS)
      // without a UTC flag (which reads as TIMESTAMP_NTZ). Normalize both
      // to the session-tz TimestampType with identical micros-since-epoch
      // values — the session time zone is pinned UTC by every entrypoint,
      // so the NTZ cast is value-preserving — matching DuckDB's
      // CAST(ts AS TIMESTAMP) view of the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000"))
        case _ =>
          col("ts").cast(org.apache.spark.sql.types.TimestampType)
      }
      raw.withColumn("ts", ts)
    } else spark.read.parquet(s"$dir/$name.parquet")
}

/** Content fingerprint of a data file (or directory of files): per file
  * name + length + mtime + an md5 of the trailing 4 KiB — for parquet, the
  * footer with row-group offsets and column stats, so even a same-length
  * same-mtime rewrite changes the fingerprint. The invalidation key behind
  * every session-lifetime memo in the engine ([[Tables]], the
  * dd_components label memo): listing plus one 4 KiB tail read per file is
  * ~ms, against the ~70 ms full re-resolve it avoids. */
object FileFingerprint {
  def of(spark: SparkSession, pathStr: String): String = {
    val path = new org.apache.hadoop.fs.Path(pathStr)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.getFileStatus(path)
    val statuses = if (root.isDirectory) fs.listStatus(path).toSeq else Seq(root)
    statuses.map { st =>
      val tailDigest = if (st.isDirectory || st.getLen == 0) "" else {
        val n = math.min(4096L, st.getLen).toInt
        val buf = new Array[Byte](n)
        val in = fs.open(st.getPath)
        try { in.seek(st.getLen - n); in.readFully(buf) } finally in.close()
        new java.math.BigInteger(1,
          java.security.MessageDigest.getInstance("MD5").digest(buf)).toString(16)
      }
      s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}:$tailDigest"
    }.sorted.mkString(",")
  }
}
