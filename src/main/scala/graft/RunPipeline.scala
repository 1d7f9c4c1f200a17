package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.{Lake, Landing}
import graft.queries.AnalyticsQueries
import graft.warehouse.AtomicCommit

/** End-to-end ELT driver (the engine-side equivalent of the reference's
  * three Streamlit stages, SURVEY §3): landing JSON → lake parquet →
  * warehouse tables → the 10 analytics queries.
  *
  * Usage: runMain graft.RunPipeline <landingDir> <outDir>
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val Array(landingDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Extract + Load (S1-S4, K1) — source behind the ingestion seam
    // (ingest.ChannelSource); a live API client implements the same trait
    val src = new graft.ingest.FixtureChannelSource(landingDir)
    val docs = Lake.buildDocuments(
      src.channels(spark), src.playlists(spark),
      src.videos(spark), src.comments(spark))
    Lake.write(docs, s"$outDir/lake")

    // Migrate (S5, P3/P5, K2/K3) — through the manifest commit, so all four
    // entity tables advance to the new snapshot atomically (the reference's
    // per-channel cross-table transaction, app.py:389); a crash mid-migrate
    // leaves every reader on the previous consistent snapshot
    val appended = AtomicCommit.migrateAtomic(spark, s"$outDir/lake", s"$outDir/warehouse")
    println(s"[pipeline] migrated rows: $appended")

    // Analyze (Q1-Q10)
    AtomicCommit.registerViews(spark, s"$outDir/warehouse")
    AnalyticsQueries.all.foreach { case (name, fn, _) =>
      println(s"[pipeline] $name -> ${fn(spark).count()} rows")
    }
    println("[pipeline] Q3 top-10 most viewed:")
    AnalyticsQueries.q3(spark).show(10, truncate = false)
    spark.stop()
  }
}
