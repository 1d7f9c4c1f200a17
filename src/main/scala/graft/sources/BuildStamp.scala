package graft.sources

import org.apache.spark.sql.{Row, SaveMode, SparkSession}

/** Torn-rebuild protection shared by every persisted index
  * ([[graft.operators.BandIndex]], [[graft.operators.IvfAdc]]): the index's
  * `meta/` table carries its parameters plus a fresh `build_id` written
  * BEFORE the artifacts, and a `commit/` marker repeats the id AFTER them.
  * A rebuild that crashes anywhere between the two leaves the ids
  * disagreeing, and every subsequent read fails LOUDLY instead of pairing
  * new parameters with old artifacts (or vice versa) — the silent-garbage
  * window a parameter-authority table otherwise leaves open. One shared
  * implementation so the protocol cannot drift between index types.
  */
object BuildStamp {

  def newId(): String = java.util.UUID.randomUUID().toString

  /** Write the `commit/` marker — call ONLY after every artifact landed. */
  def commit(spark: SparkSession, path: String, buildId: String): Unit = {
    import spark.implicits._
    Seq(buildId).toDF("build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/commit")
  }

  /** Validate the meta row's build id against the commit marker; `what`
    * names the index type in the error. Also fails (with a migration
    * message, not a field-lookup crash) on a meta row predating the
    * stamp format. */
  def requireCommitted(spark: SparkSession, path: String, metaRow: Row,
      what: String): Unit = {
    require(metaRow.schema.fieldNames.contains("build_id"),
      s"$what at $path predates the build-stamp format (meta has no " +
        "build_id) — re-run build to migrate it")
    val declared = metaRow.getAs[String]("build_id")
    // an absent/unanalyzable OR empty marker maps to "<missing: why>" so
    // the caller gets the TORN diagnostic WITH the underlying cause: a
    // marker directory that is missing, schema-less, or holds zero rows (a
    // partial marker write) must not crash the lookup itself. Only
    // AnalysisException is absorbed — a genuine IO failure (permissions,
    // corrupt footer mid-read) propagates with its own cause instead of
    // being misreported as a torn build.
    val committed =
      try spark.read.parquet(s"$path/commit")
        .select("build_id").take(1).headOption
        .map(_.getAs[String]("build_id")).getOrElse("<missing: commit marker empty>")
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          s"<missing: ${e.getSimpleMessage.linesIterator.next()}>"
      }
    require(declared == committed,
      s"$what at $path is TORN (meta build $declared vs committed " +
        s"$committed): a rebuild crashed between writing meta/ and its " +
        "artifacts — re-run build before trusting reads or appends")
  }
}
