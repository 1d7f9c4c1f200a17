package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time-travel contract of the shared manifest protocol: every publish
  * retains an immutable `manifest.v<version>` snapshot, [[SegmentedTable.readAt]]
  * reconstructs the table AS OF any published version whose segments still
  * exist, and [[SegmentedTable.vacuum]] prunes exactly the snapshots it
  * breaks (plus crash orphans) while append-only history stays readable.
  */
class SegmentedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("segtab").toString
    (root, s"$root/data")
  }

  private def publish(root: String, dataDir: String, version: Long,
      live: Seq[Long], rows: Seq[(Long, String)]): Unit = {
    rows.toDF("id", "v").write.mode("overwrite")
      .parquet(SegmentedTable.segDir(dataDir, version))
    SegmentedTable.writeManifest(spark, root,
      SegmentedTable.Manifest(version, live))
  }

  test("readAt reconstructs each published version; the live read tracks " +
      "the newest") {
    val (root, data) = freshTable()
    publish(root, data, 1L, Seq(1L), Seq(1L -> "a", 2L -> "b"))
    publish(root, data, 2L, Seq(1L, 2L), Seq(3L -> "c"))
    // compaction: segments 1+2 rewritten into 3, published as sole live
    publish(root, data, 3L, Seq(3L),
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    val v1 = SegmentedTable.readAt(spark, root, data, 1L)
      .select("id").as[Long].collect().toSet
    val v2 = SegmentedTable.readAt(spark, root, data, 2L)
      .select("id").as[Long].collect().toSet
    val v3 = SegmentedTable.readAt(spark, root, data, 3L)
      .select("id").as[Long].collect().toSet
    assert(v1 === Set(1L, 2L))
    assert(v2 === Set(1L, 2L, 3L))
    assert(v3 === Set(1L, 2L, 3L))
    val live = SegmentedTable.read(spark, data,
      SegmentedTable.readManifest(spark, root))
      .select("id").as[Long].collect().toSet
    assert(live === v3)
  }

  test("a version that was never published fails loudly") {
    val (root, data) = freshTable()
    publish(root, data, 1L, Seq(1L), Seq(1L -> "a"))
    val e = intercept[IllegalArgumentException] {
      SegmentedTable.readAt(spark, root, data, 9L)
    }
    assert(e.getMessage.contains("never published") ||
      e.getMessage.contains("vacuumed"))
  }

  test("vacuum retention: the newest retainSnapshots versions stay " +
      "time-travel readable, everything older fails loudly and is pruned") {
    val (root, data) = freshTable()
    publish(root, data, 1L, Seq(1L), Seq(1L -> "a"))
    publish(root, data, 2L, Seq(1L, 2L), Seq(2L -> "b"))
    // compact into segment 3, then append segment 4
    publish(root, data, 3L, Seq(3L), Seq(1L -> "a", 2L -> "b"))
    publish(root, data, 4L, Seq(3L, 4L), Seq(3L -> "c"))
    // retain the two newest published versions: 4 (live) and 3
    SegmentedTable.vacuum(spark, root, data, retainSnapshots = 2)
    Seq(1L, 2L).foreach { v =>
      val e = intercept[IllegalArgumentException] {
        SegmentedTable.readAt(spark, root, data, v)
      }
      assert(e.getMessage.contains("vacuumed"), s"v$v: ${e.getMessage}")
    }
    assert(SegmentedTable.readAt(spark, root, data, 3L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(SegmentedTable.readAt(spark, root, data, 4L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    // the default (retain 1) then shrinks to the live version only
    SegmentedTable.vacuum(spark, root, data)
    intercept[IllegalArgumentException] {
      SegmentedTable.readAt(spark, root, data, 3L)
    }
    assert(SegmentedTable.readAt(spark, root, data, 4L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(SegmentedTable.read(spark, data,
      SegmentedTable.readManifest(spark, root))
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("vacuum reclaims a crash-orphan snapshot (version above the live " +
      "manifest, never published)") {
    val (root, data) = freshTable()
    publish(root, data, 1L, Seq(1L), Seq(1L -> "a"))
    // simulate a crash between snapshot write and live flip: stage the
    // segment + snapshot for v2, then "crash" (live manifest still v1)
    Seq(2L -> "b").toDF("id", "v").write.mode("overwrite")
      .parquet(SegmentedTable.segDir(data, 2L))
    SegmentedTable.writeManifest(spark, root,
      SegmentedTable.Manifest(2L, Seq(1L, 2L)))
    // roll the live manifest back to v1 (what the crash left behind: the
    // writeManifest above stands in for the snapshot file; rewriting v1
    // restores the pre-crash live pointer and v1 snapshot content)
    SegmentedTable.writeManifest(spark, root,
      SegmentedTable.Manifest(1L, Seq(1L)))
    SegmentedTable.vacuum(spark, root, data)
    // the orphan snapshot and segment are both gone
    intercept[IllegalArgumentException] {
      SegmentedTable.readAt(spark, root, data, 2L)
    }
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      SegmentedTable.segDir(data, 2L))), "orphan segment must be vacuumed")
    assert(SegmentedTable.readAt(spark, root, data, 1L)
      .select("id").as[Long].collect().toSet === Set(1L))
  }

  test("time travel works end-to-end over a real index lifecycle " +
      "(BandIndex build → append)") {
    val p = java.nio.file.Files.createTempDirectory("segtab-band").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")
    graft.operators.BandIndex.build(docs, col("doc_id"), col("text"),
      numHashes = 8, bands = 2, shingleK = 2, path = p)
    val v1 = SegmentedTable.readManifest(spark, p).version
    graft.operators.BandIndex.append(p,
      Seq((3L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val v2 = SegmentedTable.readManifest(spark, p).version
    assert(v2 > v1)
    val before = SegmentedTable.readAt(spark, p, s"$p/bands", v1)
      .select("doc_id").distinct().as[Long].collect().toSet
    val after = SegmentedTable.readAt(spark, p, s"$p/bands", v2)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(before === Set(1L, 2L), "the pre-append snapshot is intact")
    assert(after === Set(1L, 2L, 3L))
  }
}
