package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.ingest.{Lake, Landing}
import graft.queries.AnalyticsQueries
import graft.warehouse.{AtomicCommit, Migration}

/** End-to-end pipeline integration (SURVEY §5.4): landing JSON → lake
  * parquet → warehouse tables → Q1–Q10, asserting golden outputs, schema
  * row counts, idempotent re-migration (K3), and DataFrame/SQL agreement
  * for every query pair. The warehouse stage runs through the MANIFEST
  * commit ([[AtomicCommit.migrateAtomic]] — the RunPipeline default), so
  * every downstream assertion reads the atomic snapshot; the legacy
  * per-table [[Migration.migrate]] path keeps its own test below.
  */
class PipelineSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val root = Files.createTempDirectory("graft-pipeline").toString
  private lazy val lakePath = s"$root/lake"
  private lazy val whPath = s"$root/warehouse"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val ch = Landing.channels(spark, resource("landing/channels.json"))
    val pl = Landing.playlists(spark, resource("landing/playlists.json"))
    val vd = Landing.videos(spark, resource("landing/videos.json"))
    val cm = Landing.comments(spark, resource("landing/comments.json"))
    Lake.write(Lake.buildDocuments(ch, pl, vd, cm), lakePath)
    AtomicCommit.migrateAtomic(spark, lakePath, whPath)
    AtomicCommit.registerViews(spark, whPath)
  }

  test("landing parse: entity row counts and edge-row handling") {
    val ch = Landing.channels(spark, resource("landing/channels.json"))
    assert(ch.count() == 4)
    // missing country -> null (P3 default applies at migration, not here)
    assert(ch.filter(col("country").isNull).count() == 1)
    val vd = Landing.videos(spark, resource("landing/videos.json"))
    assert(vd.count() == 14)
    // missing likeCount -> null likes; missing commentCount -> 0
    val v004 = vd.filter(col("video_id") === "V004").collect()(0)
    assert(v004.isNullAt(v004.fieldIndex("likes")))
    assert(v004.getAs[Long]("comment_count") == 0L)
    // S7 durations: 1h2m3s / 4m13s / 45s / 1h2s
    val durs = vd.filter(col("video_id").isin("V001", "V002", "V003", "V004"))
      .orderBy("video_id").select("duration").collect().map(_.getLong(0)).toSeq
    assert(durs == Seq(3723L, 253L, 45L, 3602L))
  }

  test("lake documents: one per channel, four embedded arrays") {
    val docs = Lake.read(spark, lakePath)
    assert(docs.count() == 4)
    val tech = docs.filter(col("channel_name") === "TechTalks").collect()(0)
    assert(tech.getAs[scala.collection.Seq[Any]]("channel_details").length == 1)
    assert(tech.getAs[scala.collection.Seq[Any]]("playlist_details").length == 2)
    assert(tech.getAs[scala.collection.Seq[Any]]("video_details").length == 4)
    assert(tech.getAs[scala.collection.Seq[Any]]("comment_details").length == 3)
    // channel with no videos gets empty arrays, not nulls
    val empty = docs.filter(col("channel_name").isNull).collect()(0)
    assert(empty.getAs[scala.collection.Seq[Any]]("video_details").isEmpty)
  }

  test("warehouse tables: counts, dropped columns, null defaults") {
    assert(spark.table("channel").count() == 4)
    assert(spark.table("playlist").count() == 4)
    assert(spark.table("video").count() == 14)
    assert(spark.table("comment").count() == 5)
    // channel_age and tags dropped at migration (reference parity)
    assert(!spark.table("channel").columns.contains("channel_age"))
    assert(!spark.table("video").columns.contains("tags"))
    // P3 defaults: missing country -> N/A; null likes -> 0; missing author -> N/A
    assert(spark.table("channel")
      .filter(col("channel_id") === "UC002").collect()(0)
      .getAs[String]("country") == "N/A")
    assert(spark.table("video")
      .filter(col("video_id") === "V004").collect()(0)
      .getAs[Long]("likes") == 0L)
    assert(spark.table("comment")
      .filter(col("comment_id") === "C004").collect()(0)
      .getAs[String]("author_name") == "N/A")
  }

  test("S6: warehouse catalog lists the four entity tables with their columns") {
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Set("channel", "playlist", "video", "comment").subsetOf(tables))
    val videoCols = spark.catalog.listColumns("video").collect().map(_.name).toSet
    assert(Set("video_id", "channel_id", "duration", "release_date").subsetOf(videoCols))
    // tags/channel_age are dropped at migration (SURVEY §1.2) — the catalog
    // must reflect the warehouse schema, not the lake schema
    assert(!videoCols.contains("tags"))
  }

  test("K3: atomic re-migration appends zero rows; snapshot version still advances") {
    val before = AtomicCommit.readManifest(spark, whPath)._1
    val second = AtomicCommit.migrateAtomic(spark, lakePath, whPath)
    assert(second == Map("channel" -> 0L, "playlist" -> 0L, "video" -> 0L, "comment" -> 0L))
    assert(AtomicCommit.readManifest(spark, whPath)._1 == before + 1)
    assert(AtomicCommit.snapshot(spark, whPath, "channel").get.count() == 4)
  }

  test("K2/K3 legacy path: per-table Migration.migrate populates and re-migrates to zero") {
    val legacy = Files.createTempDirectory("graft-legacy-wh").toString
    val first = Migration.migrate(spark, lakePath, legacy)
    assert(first == Map("channel" -> 4L, "playlist" -> 4L, "video" -> 14L, "comment" -> 5L))
    val second = Migration.migrate(spark, lakePath, legacy)
    assert(second == Map("channel" -> 0L, "playlist" -> 0L, "video" -> 0L, "comment" -> 0L))
  }

  test("Q1: null-named channel filtered out") {
    assert(rowSet(AnalyticsQueries.q1(spark)) ==
      Seq("[CookingFun]", "[DailyVlogs]", "[TechTalks]"))
  }

  test("Q2: channels by uploads desc with tiebreaker") {
    assert(AnalyticsQueries.q2(spark).collect().map(_.toString).toSeq ==
      Seq("[CookingFun,5]", "[DailyVlogs,5]", "[TechTalks,4]", "[null,0]"))
  }

  test("Q3: top-10 by views truncates 14 videos") {
    val got = AnalyticsQueries.q3(spark).collect().map(_.getAs[String]("video_title")).toSeq
    assert(got == Seq("GPU Deep Dive", "Keyboard Review", "Perfect Pasta",
      "New Year New Me", "Market Day", "Bread Basics", "Rainy Day",
      "Grill Masterclass", "Year In Review", "Valentine Cake"))
  }

  test("Q5: all like-ties survive the greatest-per-group join") {
    val got = AnalyticsQueries.q5(spark).collect()
      .map(r => (r.getAs[String]("video_title"), r.getAs[Long]("likes"))).toSeq
    assert(got == Seq(
      ("Market Day", 1000L), ("New Year New Me", 1000L),
      ("Perfect Pasta", 900L),
      ("GPU Deep Dive", 500L), ("Keyboard Review", 500L)))
  }

  test("Q8: distinct channels with 2022 releases") {
    assert(rowSet(AnalyticsQueries.q8(spark)) ==
      Seq("[CookingFun]", "[DailyVlogs]", "[TechTalks]"))
  }

  test("Q9: per-channel average duration, desc") {
    val got = AnalyticsQueries.q9(spark).collect()
      .map(r => (r.getAs[String]("channel_name"), r.getAs[Double]("avg_time"))).toSeq
    assert(got == Seq(("TechTalks", 1905.75), ("DailyVlogs", 589.8), ("CookingFun", 475.8)))
  }

  test("metamorphic: DataFrame and SQL forms agree for Q1-Q10") {
    AnalyticsQueries.all.foreach { case (name, fn, sql) =>
      assert(rowSet(fn(spark)) == rowSet(spark.sql(sql)), s"query $name")
    }
  }

  test("A4 validation: API comment counters vs true counts from comment table") {
    val got = AnalyticsQueries.trueCommentCounts(spark)
      .filter(col("video_id").isin("V001", "V005", "V003"))
      .orderBy("video_id").collect()
      .map(r => (r.getAs[Long]("api_count"), r.getAs[Long]("true_count"))).toSeq
    // fixtures carry 2 comments for V001, 1 for V005, 0 for V003
    assert(got == Seq((300L, 2L), (12L, 0L), (210L, 1L)))
  }

  test("dd_components memo: changed input data recomputes (no stale frame)") {
    val dir = Files.createTempDirectory("graft-ddc").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(s"$dir/documents.parquet")
    val q = Registry.byName("dd_components")
    val first = q.fn(spark, dir)
    assert(first.count() > 0)
    // shrink the table to a strict subset — a stale memo would still
    // return labels for the removed doc ids
    docs.filter(col("doc_id") < 25).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val second = q.fn(spark, dir)
    assert(second.filter(col("doc_id") >= 25).count() == 0,
      "memo returned labels computed from the replaced input")
  }

  test("dd_components memo: same-size same-mtime rewrite recomputes (footer content hash)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ddc2").toString
    // two corpora whose parquet files are byte-length-identical (fixed-width
    // texts, no compression) but different in content: A holds one exact-dup
    // pair (=> one LSH component), B holds word-disjoint docs (=> none)
    def writeDocs(tag: String, texts: Seq[(Long, String)]): java.nio.file.Path = {
      val d = Files.createTempDirectory(s"graft-ddc2-$tag")
      texts.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").option("compression", "none")
        .option("parquet.enable.dictionary", "false") // dup values must not shrink the file
        .parquet(d.resolve("p").toString)
      Files.list(d.resolve("p")).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
    }
    val a = writeDocs("a", Seq((1L, "w00 x00 y00 z00"), (2L, "w00 x00 y00 z00")) ++
      (3 to 9).map(i => (i.toLong, f"w$i%02d x$i%02d y$i%02d z$i%02d")))
    val b = writeDocs("b", (91 to 99).map(i => (i.toLong - 90, f"w$i%02d x$i%02d y$i%02d z$i%02d")))
    assert(Files.size(a) == Files.size(b),
      "fixture assumption broken: rewrite must be same-size to exercise the content hash")
    val target = java.nio.file.Paths.get(dir, "documents.parquet")
    Files.copy(a, target)
    val mtime = Files.getLastModifiedTime(target)
    val q = Registry.byName("dd_components")
    assert(q.fn(spark, dir).count() > 0, "corpus A has a dup pair")
    Files.copy(b, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(target, mtime) // same name, size, AND mtime
    assert(q.fn(spark, dir).count() == 0,
      "memo returned stale labels for a same-size same-mtime rewrite")
  }

  test("dd_components memo: changed shuffle width recomputes and agrees") {
    val q = Registry.byName("dd_components")
    val base = rowSet(q.fn(spark, "/root/testdata/sf0.001"))
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(rowSet(q.fn(spark, "/root/testdata/sf0.001")) == base)
    finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
