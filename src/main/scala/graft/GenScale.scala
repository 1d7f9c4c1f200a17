package graft

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** sf1 scaling-rehearsal fixture generator (round-14 directive #4: the
  * 100× claim rested on ONE measured decade, sf0.01→sf0.1 — this main
  * manufactures the decade ABOVE the driver's largest fixture so the
  * slope table spans two).
  *
  * The driver's generator is not available in this sandbox, so sf1 is
  * REPO-generated, distribution-matched to the driver's sf0.1 (measured,
  * not guessed — every parameter below was read off the sf0.1 parquet):
  *
  *   - TPC-H-ish tables (`customer supplier part orders lineitem
  *     events`): replicated ×10 with FK-CONSISTENT key striding — every
  *     key column is offset by `replica × (its sf0.1 key-range width)` in
  *     every table that carries it, so join fan-ins and group sizes scale
  *     exactly the way a 10× fixture's would; non-key columns repeat,
  *     which preserves every value distribution. `region`/`nation` are
  *     dimension constants, copied as-is (they do not scale in TPC-H
  *     either).
  *   - `documents`: GENERATED, not replicated — replication would put
  *     every doc in an exact-dup cluster of 10 and quadratically explode
  *     every dedup family's pair counts, turning the slope table into
  *     fiction. Measured sf0.1 shape reproduced: 30-word uniform vocab,
  *     uniform 10..100 words/doc, langs at the measured weights, 20
  *     uniform sources, ~0.16% planted exact-dup pairs and ~5% planted
  *     near-dup pairs (copy of an earlier doc with one word replaced by
  *     the rare marker token "dup" and the last word dropped half the
  *     time — the observed sf0.1 mutation, Jaccard ≈ 0.95–0.99).
  *   - `embeddings`: GENERATED around the sf0.1 geometry (×4 per decade,
  *     the driver's own ratio → 8000 rows): per-label centroids and
  *     within-cluster std are MEASURED from sf0.1 and fresh gaussian
  *     points are drawn around them, so ANN bucket occupancy and kNN
  *     recall shapes stay comparable.
  *
  * Deterministic (seed 42 throughout); writes to `args(0)` (default
  * /tmp/graft-sf1). Never touches /root/testdata.
  */
object GenScale {

  private val Factor = 10

  /** Bumped whenever ANY generation parameter or algorithm changes, so a
    * stale on-disk fixture can never silently serve a new protocol run.
    * v2 (round 16): replicated tables are written as [[OutFiles]] files
    * instead of inheriting the base fixture's 1–2-file layout — a 6M-row
    * sf1 lineitem in 2 single-row-group files scans on ≤2 tasks of a
    * 32-core machine, so every cheap scan+aggregate's upper-decade slope
    * measured FILE LAYOUT, not the engine (q09/q05/q03/st decompositions
    * under plans/r16/, the _sf1_metrics files: single-task scan pipelines
    * of 0.5–2.2 s summed vs millisecond downstream stages). Content is
    * unchanged —
    * same rows, deterministic round-robin placement. */
  private val GeneratorVersion = 2

  /** File count for replicated-table writes: one scan task per file (the
    * files are single-row-group at these sizes), sized so the rehearsal
    * machine's 32 cores all participate in the scan — the §6 "fix input
    * skew at the source" rule applied to our own generator. */
  private val OutFiles = 32

  /** The manifest a finished generation writes next to its tables; a rerun
    * with an identical manifest skips regeneration (the round-15
    * repeatable-rehearsal directive: `scripts/bench_scale.sh` must be
    * rerunnable without paying the ~1 min generation each time, yet a
    * changed generator or base fixture must regenerate). */
  private def manifest(src: String): String =
    s"""{"generator_version":$GeneratorVersion,"factor":$Factor,"seed":42,"base":"$src"}"""

  def main(args: Array[String]): Unit = {
    val out = args.filterNot(_ == "--force").headOption
      .getOrElse("/tmp/graft-sf1")
    val src = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val manifestFile = new java.io.File(s"$out/_genscale_manifest.json")
    val force = args.contains("--force") ||
      sys.env.get("SPARK_GRAFT_GENSCALE_FORCE").contains("1")
    if (!force && manifestFile.isFile && {
      val have = new String(java.nio.file.Files.readAllBytes(
        manifestFile.toPath), "UTF-8").trim
      have == manifest(src)
    }) {
      println(s"""{"metric":"genscale","out":"$out","skipped":true}""")
      return
    }
    if (manifestFile.isFile) manifestFile.delete() // stale: invalidate first
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")

    /** Replicate ×Factor with per-key strides = the key's sf0.1 range
      * width, applied IDENTICALLY wherever the key appears (FK
      * consistency). */
    def replicate(df: DataFrame, strides: Map[String, Long]): DataFrame = {
      val reps = explode(array((0 until Factor).map(r => lit(r.toLong)): _*))
      val withR = df.withColumn("__r", reps)
      withR.select(df.columns.map { c =>
        strides.get(c) match {
          case Some(s) => (col(c) + col("__r") * s).as(c)
          case None => col(c)
        }
      }: _*)
        // OutFiles single-row-group output files, not the base fixture's
        // 1–2 (see GeneratorVersion v2): round-robin is deterministic
        // under sortBeforeRepartition over the deterministic explode
        .repartition(OutFiles)
    }

    // key strides measured off sf0.1 (max+1 of each key range)
    val kCust = 15000L
    val kOrder = 150000L
    val kPart = 20000L
    val kSupp = 1000L
    val kUser = 1500L
    val kEvent = 100000L

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"), Map("c_custkey" -> kCust)), "customer")
    write(replicate(read("supplier"), Map("s_suppkey" -> kSupp)), "supplier")
    write(replicate(read("part"), Map("p_partkey" -> kPart)), "part")
    write(replicate(read("orders"),
      Map("o_orderkey" -> kOrder, "o_custkey" -> kCust)), "orders")
    write(replicate(read("lineitem"),
      Map("l_orderkey" -> kOrder, "l_partkey" -> kPart,
        "l_suppkey" -> kSupp)), "lineitem")
    write(replicate(read("events"),
      Map("event_id" -> kEvent, "user_id" -> kUser)), "events")

    write(genDocuments(spark, nDocs = 50000), "documents")
    write(genEmbeddings(spark, read("embeddings"), nVecs = 8000), "embeddings")

    // manifest LAST: its presence asserts every table above completed
    java.nio.file.Files.write(manifestFile.toPath,
      (manifest(src) + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"genscale","out":"$out","factor":$Factor}""")
    spark.stop()
  }

  /** sf0.1-shaped synthetic documents (see object scaladoc). */
  private def genDocuments(spark: SparkSession, nDocs: Int): DataFrame = {
    val rng = new java.util.Random(42L)
    val vocab = Array("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow", "line",
      "part", "fast", "the", "row", "agg", "key", "query", "a", "scan",
      "batch")
    val langs = Array("en", "zh", "es", "fr", "de")
    val langW = Array(0.41, 0.15, 0.15, 0.15, 0.14)
    def pickLang(): String = {
      val u = rng.nextDouble()
      var acc = 0.0
      var i = 0
      while (i < langW.length - 1 && acc + langW(i) < u) { acc += langW(i); i += 1 }
      langs(i)
    }
    val words = new Array[Array[String]](nDocs)
    val lang = new Array[String](nDocs)
    val source = new Array[String](nDocs)
    for (i <- 0 until nDocs) {
      val len = 10 + rng.nextInt(91)
      words(i) = Array.fill(len)(vocab(rng.nextInt(vocab.length)))
      lang(i) = pickLang()
      source(i) = s"src${rng.nextInt(20)}"
    }
    // planted near-dup pairs (b := mutated copy of a): measured 25/500 at
    // sf0.01 → 5% rate; mutation = one word → "dup", last word dropped
    // half the time
    val nNear = nDocs / 20
    for (_ <- 0 until nNear) {
      val a = rng.nextInt(nDocs)
      val b = rng.nextInt(nDocs)
      if (a != b) {
        val w = words(a).clone()
        w(rng.nextInt(w.length)) = "dup"
        words(b) = if (rng.nextBoolean() && w.length > 10) w.dropRight(1) else w
      }
    }
    // planted exact-dup pairs: measured 8/5000 at sf0.1
    val nExact = math.max(1, nDocs * 8 / 5000)
    for (_ <- 0 until nExact) {
      val a = rng.nextInt(nDocs)
      val b = rng.nextInt(nDocs)
      if (a != b) words(b) = words(a)
    }
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](nDocs)
    for (i <- 0 until nDocs) {
      val text = words(i).mkString(" ")
      rows.add(Row(i.toLong, text, lang(i), source(i), text.length.toLong))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(rows, schema).repartition(32)
  }

  /** Gaussian clusters around the MEASURED sf0.1 per-label geometry. */
  private def genEmbeddings(spark: SparkSession, base: DataFrame,
      nVecs: Int): DataFrame = {
    val dim = 64
    val byLabel = base.collect().groupBy(_.getAs[Int]("label"))
    val labels = byLabel.keys.toArray.sorted
    val centroid = labels.map { l =>
      val vs = byLabel(l).map(_.getSeq[Float](1).toArray)
      val c = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(j => c(j) += v(j)))
      (0 until dim).foreach(j => c(j) /= vs.length)
      l -> c
    }.toMap
    val sd = labels.map { l =>
      val vs = byLabel(l).map(_.getSeq[Float](1).toArray)
      val c = centroid(l)
      var s2 = 0.0
      vs.foreach(v => (0 until dim).foreach(j =>
        s2 += (v(j) - c(j)) * (v(j) - c(j))))
      l -> math.sqrt(s2 / (vs.length.toLong * dim))
    }.toMap
    val rng = new java.util.Random(42L)
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](nVecs)
    for (i <- 0 until nVecs) {
      val l = labels(rng.nextInt(labels.length))
      val c = centroid(l)
      val s = sd(l)
      val v = Array.tabulate(dim)(j => (c(j) + s * rng.nextGaussian()).toFloat)
      rows.add(Row(i.toLong, v.toSeq, l))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    spark.createDataFrame(rows, schema).repartition(8)
  }
}
