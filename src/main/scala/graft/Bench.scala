package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end through the noop
  * sink (full materialization of every column — `count()` would let Catalyst
  * prune the projections we mean to measure).
  *
  * The JSON also carries `calibration_sec`: a fixed, scale-factor-independent
  * reference workload (4M-row hash + sort, measured min-of-5 like every
  * query). Because the workload never changes, round-over-round drift in
  * this number is machine/co-tenant load, not engine change — divide the
  * query times by (calibration_sec / its historical floor) to compare runs
  * across differently-loaded environments.
  *
  * Diagnostics in the JSON (round-9 drift bisect):
  *   - `plan_sec`: per-query time to BUILD + fully plan the DataFrame
  *     (fn call, analysis, optimization, physical planning — everything a
  *     measured run pays before the first task), measured on a fresh frame
  *     after the timed runs. Separates fixed planning overhead from
  *     execution when a query's total drifts.
  *   - `codegen_compiles`: per-query count of whole-stage/expression codegen
  *     COMPILATIONS observed during the 5 measured (warm!) runs. A warm run
  *     should hit the generated-class cache and report ~0; sustained
  *     non-zero counts mean the suite's generated classes exceed
  *     `spark.sql.codegen.cache.maxEntries` and every interleaved pass
  *     recompiles (Janino) what the previous pass evicted — a fixed
  *     per-query tax unrelated to the plan.
  *
  * ROOT CAUSE of the r6→r8 drift (+42% normalized vs the r5 best,
  * st_tumbling_window 2.2× its r5 self with unchanged code): Spark's
  * generated-class cache holds `spark.sql.codegen.cache.maxEntries` = 100
  * classes by default. The headline suite compiles ~150 distinct generated
  * classes per pass, and round 6 switched the 5 measured runs from
  * back-to-back per query to INTERLEAVED round-robin passes (to decorrelate
  * co-tenant load spikes) — so by the time a query runs again, the rest of
  * the suite has evicted its classes and every "warm" run re-pays full
  * Janino compilation. The tax is absolute (~50-200ms/query), which is why
  * cheap queries drifted the most in relative terms and the drift grew as
  * rounds added headline queries. Fix: size the cache to the suite
  * (SPARK_GRAFT_CODEGEN_CACHE, default 4096 — a generated class is a few KB
  * of bytecode, so the ceiling is a few tens of MB, the same trade a
  * long-lived production session serving a large query registry makes).
  * Measured at sf0.1: codegen_compiles drop to 0 for all queries after
  * warm-up and st_tumbling_window returns to its r5-normalized cost.
  *
  * ROOT CAUSE of dd_lsh_pairs' residual warm-run compiles (~6-14/round
  * with the cache already sized): AQE numbers `codegenStageId` in
  * stage-MATERIALIZATION order, and dd_lsh_pairs has independent racing
  * stages (the empty re-attach broadcast branches vs the pair pipeline),
  * so run-to-run the same physical plan gets permuted stage numbers —
  * verified by diffing exprid-normalized final plans across passes: byte
  * -identical except `*(12)`/`*(13)` span ids. The stage id is embedded
  * in the generated CLASS NAME (`GeneratedIteratorForCodegenStage<N>`),
  * which is part of the source text Janino's cache keys on, so an
  * already-compiled span re-compiles under its new number. Fix:
  * `spark.sql.codegen.useIdInClassName=false` (SPARK-23032's escape
  * hatch) — the id stays in the comment for debugging, leaves the cache
  * key, and warm passes compile 0 under EITHER stage ordering (verified
  * over 6 passes hitting both orderings). The remaining fixed per-run
  * cost of dd_lsh_pairs is ~0.5s of Catalyst planning: the operator's
  * three branches over the checkpointed signature projection are planned
  * fresh per construction (Spark has no cross-construction plan cache) —
  * irrelevant to a long-lived session that builds once, inherent to a
  * benchmark that rebuilds per pass.
  */
object Bench {

  /** Fixed-size calibration workload: deterministic, SF-independent,
    * exercising codegen arithmetic + one range-partitioned sort, the same
    * resources the real queries use. */
  private def calibration(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0, 4000000L)
      .select(xxhash64(col("id")).as("k"))
      .orderBy("k")

  /** SECOND calibration sentinel (round-14 directive): a differently-
    * SHAPED fixed workload — a 64M-row scan-aggregate with zero shuffle
    * beyond the final one-row agg, so it is memory-bandwidth/ALU-bound
    * where [[calibration]] is sort/exchange-bound. Two sentinels that
    * disagree flag WHICH resource a co-tenant is stealing; round-over-
    * round normalization stops hinging on one noisy divisor. */
  private def calibration2(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0, 64000000L)
      // the % bounds each term well under 2^20 so the 64M-row ANSI long
      // sum cannot overflow (≤ ~2^46)
      .select(((col("id") * lit(2654435761L) + lit(104729L)) % lit(1048576L))
        .as("x"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))

  /** Every scratch/memoized dir this bench run created, deleted by ONE
    * shutdown hook — repeated bench invocations and SF sweeps must not
    * accumulate disk under java.io.tmpdir (round-13 ADVICE). */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def newScratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    scratchDirs.add(d)
    d
  }
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(d))
      }))
  }

  /** One benchable unit: a name and a DataFrame constructor bound to an
    * SF dir. Registry queries wrap `q.fn`; bench-local micros (the
    * persisted-index serve) supply their own constructor. */
  private final case class B(name: String,
      mk: (SparkSession, String) => org.apache.spark.sql.DataFrame)

  /** Persisted-index serve micro: BM25 top-k against a pre-built
    * [[graft.operators.LexIndex]]. The build is a one-time cost (like
    * loading the tables) and runs OUTSIDE the timed window, memoized per
    * SF dir — and so is the serve FRAME (round-14 directive): a real
    * serving tier reads the manifest and plans its query shape ONCE,
    * then re-executes it per request, so re-paying the manifest read +
    * bucket-key collect + Catalyst assembly inside every timed pass
    * measured plan-protocol cost, not serving (30–60% of the r13 serve
    * numbers). The index is immutable post-build, so the memoized frame
    * serves the same snapshot every pass. */
  private val lexIndexDirs = scala.collection.mutable.Map.empty[String, String]
  private val lexServeFrames =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
  private def lexServe(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    lexServeFrames.getOrElseUpdate(sfDir, {
      val p = lexIndexDirs.getOrElseUpdate(sfDir, {
        val dir = newScratchDir("bench-lexindex")
        graft.operators.LexIndex.build(
          graft.sources.Tables(spark, sfDir, "documents")
            .select("doc_id", "text"), dir, buckets = 64)
        dir
      })
      graft.operators.LexIndex.searchTopK(spark, p,
        Seq("dup", "vector", "window", "stream"), k = 20)
    })

  /** Stored-model quality serve (round 13 — the verdict's top ask): the
    * logistic weights are TRAINED ONCE outside the timed window (memoized
    * per SF dir, the lexServe pattern) and the measured unit is what a
    * quality-filtered ingest pays per batch — one row-local scoring map
    * with the one-row weights broadcast in. Training cost stays visible
    * as the separate `tx_quality_train` micro. */
  private val qualityModelDirs = scala.collection.mutable.Map.empty[String, String]
  private def qualityModelDir(spark: SparkSession, sfDir: String): String =
    qualityModelDirs.getOrElseUpdate(sfDir, {
      val dir = newScratchDir("bench-qualitymodel")
      graft.operators.QualityModel.build(
        graft.sources.Tables(spark, sfDir, "documents"), col("text"), dir)
      dir
    })
  // serve FRAME memoized per SF dir (see lexServe): the stored weights are
  // immutable post-build, so re-reading meta/commit/weights per timed pass
  // (two head() jobs + a parquet read) measured protocol, not scoring
  private val qualityServeFrames =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
  private def qualityServe(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    qualityServeFrames.getOrElseUpdate(sfDir,
      graft.operators.QualityModel.score(qualityModelDir(spark, sfDir),
        graft.sources.Tables(spark, sfDir, "documents"), col("text")))

  /** Stored-graph ANN serve: [[graft.operators.GraphIndex.searchTopK]]
    * against a prebuilt index (memoized build outside the timed window) —
    * LSH-bucket seeds, stored-edge expansion, exact rerank. The build cost
    * stays visible as `sim_nndescent_train` (the raw graph construction,
    * the number previously reported AS sim_nndescent's bench entry). */
  private val graphIndexDirs = scala.collection.mutable.Map.empty[String, String]
  private def graphIndexDir(spark: SparkSession, sfDir: String): String =
    graphIndexDirs.getOrElseUpdate(sfDir, {
      val dir = newScratchDir("bench-graphindex")
      graft.operators.GraphIndex.build(
        graft.sources.Tables(spark, sfDir, "embeddings"), dir,
        k = 16, iters = 3, revCap = 16)
      dir
    })
  // serve FRAME memoized per SF dir (see lexServe): the manifest read +
  // meta head() + plan assembly of the seed/expand/rerank shape happen
  // once, the way a serving tier holds a prepared frame per snapshot
  private val graphServeFrames =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
  private def graphServe(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    graphServeFrames.getOrElseUpdate(sfDir,
      graft.operators.GraphIndex.searchTopK(spark,
        graphIndexDir(spark, sfDir),
        graft.sources.Tables(spark, sfDir, "embeddings")
          .filter(col("vec_id") < 256),
        k = 10, hops = 2, seedK = 8))

  /** Per-batch SCD2 dimension merge (round-12's k5 semantics on the same
    * inputs) — the maintenance path a streaming dimension sink pays per
    * batch; correctness is judged (`k5_scd2_merge`), this guards its
    * wall-clock. */
  private def scd2Merge(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val cur = graft.sources.Tables(spark, sfDir, "customer").select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      to_timestamp(lit("1995-01-01")).as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"))
    val upd = graft.sources.Tables(spark, sfDir, "orders").select(
      col("o_custkey").as("k"), col("o_orderpriority").as("seg"),
      col("o_orderdate").as("ts"))
    graft.warehouse.Scd2.merge(cur, upd, Seq("k"), Seq("seg"), "ts")
  }

  /** One-pass model/maintenance micros (no warm-up, one timed run — these
    * are BUILD-shaped: a second "warm" pass would just train again). */

  /** Full classifier training cost, end-to-end: GD rounds + the persisted
    * one-row weights. A fresh temp dir per run — nothing memoized, the
    * point IS the build. */
  private def qualityTrain(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val dir = newScratchDir("bench-qualitytrain")
    graft.operators.QualityModel.build(
      graft.sources.Tables(spark, sfDir, "documents"), col("text"), dir)
    graft.operators.QualityModel.weights(spark, dir)
  }

  /** Raw NN-Descent k-NN graph construction (the judged sim_nndescent
    * trajectory, timed as the build it is). */
  private def nndescentTrain(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    graft.operators.NnDescent.knnGraph(
      graft.sources.Tables(spark, sfDir, "embeddings"),
      col("vec_id"), col("embedding"), k = 16, iters = 3, revCap = 16)

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** GraphIndex maintenance cycle (round-12 made it correct; this guards
    * its cost): on a COPY of the prebuilt index — the serve index stays
    * pristine — append a 256-vector batch, `compact(relink = true)` (the
    * staleness heal), then serve top-k from the healed index. The whole
    * cycle is timed: copy + append + relink + serve is what an index
    * owner pays per maintenance window. */
  private def graphIndexMaintain(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    val base = graphIndexDir(spark, sfDir)
    val dir = newScratchDir("bench-graphmaint")
    copyDir(base, dir)
    val batch = graft.sources.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    graft.operators.GraphIndex.append(spark, dir, batch)
    graft.operators.GraphIndex.compact(spark, dir, relink = true)
    graft.operators.GraphIndex.searchTopK(spark, dir,
      graft.sources.Tables(spark, sfDir, "embeddings")
        .filter(col("vec_id") < 64),
      k = 10, hops = 2, seedK = 8)
  }

  /** Cumulative codegen compilation count for this JVM (driver-side is the
    * compiling side in local mode; the metric registers compilations from
    * `CodeGenerator.compile` cache misses). */
  private def codegenCompileCount: Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf — must be set at session construction. See the scaladoc
      // root-cause note: the default (100) is smaller than the suite's
      // generated-class working set, so interleaved passes thrash the cache.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // keep AQE's nondeterministic stage numbering out of generated class
      // names so the codegen cache hits across runs — see the dd_lsh_pairs
      // root-cause note in the scaladoc
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    // AQE races its broadcast-exchange jobs against re-planning: when
    // empty-relation propagation prunes a join subtree whose broadcast
    // stage was already submitted (dd_lsh_pairs' re-attach joins on a
    // dup-light corpus hit this every few runs), the orphaned single-task
    // stage still completes — and its task's SQLMetrics belong to the
    // DISCARDED subtree, so the DAGScheduler logs one harmless
    // "Failed to update accumulator" ERROR per metric (the "non-existent
    // accumulator" text lives in the ATTACHED SparkException, which log4j's
    // RegexFilter never sees — it matches only the formatted message, so
    // the filter regex must target the DAGScheduler's own message text)
    // (verified at INFO level: the burst directly follows "Finished task
    // 0.0 in stage N (1/1)" of a withThreadLocalCaptured broadcast job,
    // after the query's final stage already finished). Results and rc are
    // unaffected; real query failures reach us as EXCEPTIONS and are
    // reported via failed_queries below. Drop ONLY that message (regex
    // filter on the DAGScheduler logger) — any other scheduler ERROR stays
    // visible in the artifact.
    locally {
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.filter.RegexFilter
      val dag = "org.apache.spark.scheduler.DAGScheduler"
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        dag, org.apache.logging.log4j.Level.WARN)
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[LoggerContext]
      ctx.getConfiguration.getLoggerConfig(dag).addFilter(
        RegexFilter.createFilter(".*Failed to update accumulator.*", null, false,
          Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    }
    val tier1 = Registry.all.filter(_.headline).map(q => B(q.name, q.fn))
    // tier 2 (round 12, re-cut round 13): the heaviest QUERY-shaped
    // operator families — marked in Registry.Tier2 — plus the stored-
    // model/index SERVE micros (lex BM25, quality scoring, graph ANN) and
    // the per-batch SCD2 merge. Measured with the same interleaved-min
    // protocol but 3 passes instead of 5 (these are multi-second
    // operators; 3 passes bounds suite wall-clock while still shedding
    // one co-tenant spike). The model/graph BUILD costs are measured
    // separately below (tier2build) so a serve-path regression is no
    // longer invisible inside training noise — the round-12 verdict's
    // top finding.
    val tier2 = Registry.all.filter(_.headline2).map(q => B(q.name, q.fn)) ++
      Seq(B("lex_index_serve", lexServe),
        B("quality_model_serve", qualityServe),
        B("graph_index_serve", graphServe),
        B("scd2_merge", scd2Merge))
    // build/maintenance micros: ONE timed pass each, no warm-up — these
    // are build-shaped (a warm-up would just train twice) and their cost
    // is inherently one-shot per maintenance window.
    val tier2build = Seq(
      B("tx_quality_train", qualityTrain),
      B("sim_nndescent_train", nndescentTrain),
      B("graph_index_maintain", graphIndexMaintain))
    def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Warm-up pass + `nRuns` INTERLEAVED measured passes over `bs` at
      * `dir`: min-of-n per query, per-query codegen-compile counts, failed
      * set. Interleaving (round-robin passes, not back-to-back runs per
      * query) keeps a sustained co-tenant spike from poisoning every
      * sample of one query — the BENCH_r06 lesson; the codegen cache is
      * sized to the suite so interleaving no longer thrashes it.
      *
      * Self-normalization (round-15 directive — BENCH_r14's driver
      * artifact logged a 35% phantom headline regression that only a
      * judge re-run could de-noise): BOTH calibration sentinels run
      * INSIDE every measured pass, at its head, so each pass carries its
      * own machine-state witness taken at the same moment as its query
      * samples — the end-of-run sentinel measures a different machine
      * state minutes later (r14's three-states-in-one-artifact failure).
      * Per-pass suite sums are kept so the ledger can report a min-of-N
      * whole-pass sample next to the per-query mins. */
    case class Measured(results: Seq[(String, Double)],
        compiles: Map[String, Long], failed: Set[String],
        passSums: Seq[Double], passCalib: Seq[Double],
        passCalib2: Seq[Double])
    val Cal1 = "__calib1"
    val Cal2 = "__calib2"
    def measure(bs: Seq[B], dir: String, nRuns: Int): Measured = {
      val withCal = Seq(B(Cal1, (s, _) => calibration(s)),
        B(Cal2, (s, _) => calibration2(s))) ++ bs
      withCal.foreach { b =>
        try runNoop(b.mk(spark, dir))
        catch { case _: Throwable => () }
      }
      val samples = collection.mutable.Map.empty[String, List[Double]]
      val compiles = collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      val failedQ = collection.mutable.Set.empty[String]
      for (_ <- 1 to nRuns; b <- withCal) {
        val c0 = codegenCompileCount
        val t0 = System.nanoTime()
        try runNoop(b.mk(spark, dir))
        catch { case e: Throwable =>
          failedQ += b.name
          System.err.println(s"[bench] ${b.name} FAILED at $dir: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        samples.updateWith(b.name)(s => Some(dt :: s.getOrElse(Nil)))
        compiles(b.name) += codegenCompileCount - c0
      }
      // a failed query must not report a flatteringly tiny time
      val results = bs.map(b =>
        b.name -> (if (failedQ(b.name)) -1.0 else samples(b.name).min))
      // post-hoc per-pass sums over NON-failed queries only (samples are
      // recorded latest-first; index nRuns-1-pass recovers pass order)
      val ok = bs.map(_.name).filterNot(failedQ)
      val passSums = (0 until nRuns).map(p =>
        ok.map(n => samples(n)(nRuns - 1 - p)).sum)
      def passOf(n: String): Seq[Double] =
        (0 until nRuns).map(p => samples(n)(nRuns - 1 - p))
      Measured(results, compiles.toMap.withDefaultValue(0L),
        failedQ.toSet - Cal1 - Cal2,
        passSums, passOf(Cal1), passOf(Cal2))
    }

    /** Planning-vs-execution split: time to construct + fully plan a FRESH
      * frame (what every measured run pays before its first task); called
      * after the timed runs so the split never perturbs them. Min-of-2 —
      * a single cold sample can exceed the min-of-N run totals it is
      * compared against (BENCH_r13 caught lex_index_serve's one-shot
      * plan reading above its own serve time on an I/O hiccup). */
    def planSplit(bs: Seq[B], dir: String): Seq[(String, Double)] =
      bs.map { b =>
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { b.mk(spark, dir).queryExecution.executedPlan; () }
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        b.name -> samples.min
      }

    /** One COLD timed pass per entry — the build-micro protocol (the
      * serve micros' one-time builds are forced FIRST via their memoized
      * dirs so e.g. tx_quality_train doesn't also pay the serve path's
      * memoization). */
    def measureOnce(bs: Seq[B], dir: String)
        : (Seq[(String, Double)], Set[String]) = {
      val failedQ = collection.mutable.Set.empty[String]
      val rs = bs.map { b =>
        val t0 = System.nanoTime()
        try runNoop(b.mk(spark, dir))
        catch { case e: Throwable =>
          failedQ += b.name
          System.err.println(s"[bench] ${b.name} FAILED at $dir: ${e.getMessage}")
        }
        b.name -> (if (failedQ(b.name)) -1.0
          else (System.nanoTime() - t0) / 1e9)
      }
      (rs, failedQ.toSet)
    }

    val m1 = measure(tier1, sfDir, nRuns = 5)
    val (results, compiles, failed1) = (m1.results, m1.compiles, m1.failed)
    val m2 = measure(tier2, sfDir, nRuns = 3)
    val (results2, compiles2, failed2) = (m2.results, m2.compiles, m2.failed)
    val (resultsB, failedB) = measureOnce(tier2build, sfDir)
    // SECOND build pass = steady-state (round-16 directive #4): the cold
    // number folds in one-time costs a long-lived session never repays
    // (first-use LazyCheckpoint materialization of the shared corpus
    // frames, JIT) — sim_nndescent_train swung ±15% round-to-round on
    // exactly that. Cold stays the headline build number (protocol
    // unchanged); warm is reported alongside so regressions are judged on
    // steady-state. Builds still rebuild from parquet end-to-end every
    // pass (fresh scratch dirs; nothing result-shaped is reused).
    val (resultsBWarm, failedBWarm) = measureOnce(tier2build, sfDir)
    val planSec = planSplit(tier1, sfDir)
    val planSec2 = planSplit(tier2, sfDir)

    // scaling-slope check: re-measure EVERY benched query at the sibling
    // 10×-smaller SF and report t(big)/t(small) per query. A query whose
    // slope far exceeds the data ratio is super-linear — the operator a
    // 100× scale-up breaks first — caught here before it happens. Slopes
    // of sub-second queries are noisy (fixed per-query overhead dominates
    // at the small SF); read them against the absolute times.
    // SPARK_GRAFT_SLOPE_DIR overrides the sibling-SF convention — the sf1
    // rehearsal (GenScale output under /tmp) pairs with sf0.1 as its
    // 10×-smaller sibling
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SLOPE_DIR",
      sfDir.replace("sf0.1", "sf0.01"))
    val slope: Seq[(String, Double)] =
      if (smallDir != sfDir && new java.io.File(smallDir).isDirectory
          && sys.env.getOrElse("SPARK_GRAFT_SLOPE", "1") == "1") {
        val small = measure(tier1 ++ tier2, smallDir, nRuns = 3).results
        val (smallB, _) = measureOnce(tier2build, smallDir)
        val bigByName = (results ++ results2 ++ resultsB).toMap
        (small ++ smallB).collect {
          case (n, s) if s > 0 && bigByName.getOrElse(n, -1.0) >= 0 =>
            n -> bigByName(n) / s
        }
      } else Nil

    // calibration sentinels: same warm-up + min-of-5 protocol as the
    // queries; two differently-shaped workloads (sort/exchange-bound vs
    // scan-agg bandwidth-bound) so cross-round normalization has a second
    // witness — see the calibration2 scaladoc
    def timedMin5(mk: => org.apache.spark.sql.DataFrame): Double = {
      runNoop(mk)
      (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        runNoop(mk)
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val calib = timedMin5(calibration(spark))
    val calib2 = timedMin5(calibration2(spark))
    // normalization divisors (round-15 directive): the MIN of each
    // sentinel's interleaved in-pass samples and its end-of-run min-of-5 —
    // the best machine state any witness saw this run. Dividing a query's
    // raw seconds by this yields a unit-less multiple-of-sentinel that
    // survives co-tenant load differences between rounds.
    val calN = (m1.passCalib ++ m2.passCalib :+ calib).min
    val calN2 = (m1.passCalib2 ++ m2.passCalib2 :+ calib2).min
    def norm(rs: Seq[(String, Double)], c: Double): Seq[(String, Double)] =
      rs.map { case (k, v) => k -> (if (v < 0) v else v / c) }
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    def jarr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    def jcomp(bs: Seq[B], m: Map[String, Long]): String =
      bs.map(b => "\"" + b.name + s"""":${m(b.name)}""")
        .mkString("{", ",", "}")
    // failed queries stay visible as -1.0 per query but must NOT join the
    // sum — a -1 sentinel would LOWER the total, making a broken round
    // look faster than a working one
    def totalOf(rs: Seq[(String, Double)]): Double =
      rs.collect { case (_, v) if v >= 0 => v }.sum
    val total = totalOf(results)
    val total2 = totalOf(results2)
    val totalB = totalOf(resultsB)
    val totalBWarm = totalOf(resultsBWarm)
    val failedQ = failed1 ++ failed2 ++ failedB ++ failedBWarm
    val failedField =
      if (failedQ.isEmpty) ""
      else failedQ.toSeq.sorted.map("\"" + _ + "\"")
        .mkString(""","failed_queries":[""", ",", "]")
    val slopeField =
      if (slope.isEmpty) ""
      else s""","slope":${jmap(slope)},"slope_sf":"$smallDir""""
    // whole-pass headline samples: each of the 5 interleaved passes yields
    // ONE suite-sum sample (and its own in-pass sentinel), so the ledger
    // carries a min-of-5 whole-suite number — one co-tenant spike can no
    // longer write a phantom regression into the round-over-round story —
    // plus the per-pass sentinel-normalized minimum, the cross-round
    // comparable form
    val passMin = m1.passSums.min
    val passNormMin =
      m1.passSums.zip(m1.passCalib).map { case (s0, c) => s0 / c }.min
    println(f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","calibration_sec":$calib%.3f,"calibration2_sec":$calib2%.3f,"calibration_interleaved_sec":$calN%.3f,"calibration2_interleaved_sec":$calN2%.3f$failedField,"queries":${jmap(results)},"queries_norm":${jmap(norm(results, calN))},"queries_norm2":${jmap(norm(results, calN2))},"headline_pass_sec":${jarr(m1.passSums)},"headline_pass_min_sec":$passMin%.3f,"headline_pass_norm_min":$passNormMin%.3f,"plan_sec":${jmap(planSec)},"codegen_compiles":${jcomp(tier1, compiles)},"tier2_total_sec":$total2%.3f,"tier2_queries":${jmap(results2)},"tier2_queries_norm":${jmap(norm(results2, calN))},"tier2_plan_sec":${jmap(planSec2)},"tier2_codegen_compiles":${jcomp(tier2, compiles2)},"tier2_build_total_sec":$totalB%.3f,"tier2_build_sec":${jmap(resultsB)},"tier2_build_warm_total_sec":$totalBWarm%.3f,"tier2_build_warm_sec":${jmap(resultsBWarm)}$slopeField,"sf":"$sfDir"}""")
    // compact totals-only line AFTER the full line: the driver's bounded
    // tail capture truncated BENCH_r12's (large) JSON and lost the
    // headline — the most important numbers must survive any tail window
    println(f"""{"metric":"bench_summary","total_headline_sec":$total%.3f,"headline_pass_min_sec":$passMin%.3f,"headline_pass_norm_min":$passNormMin%.3f,"total_headline_norm":${total / calN}%.3f,"total_headline_norm2":${total / calN2}%.3f,"tier2_total_sec":$total2%.3f,"tier2_total_norm":${total2 / calN}%.3f,"tier2_build_total_sec":$totalB%.3f,"calibration_sec":$calib%.3f,"calibration2_sec":$calib2%.3f,"calibration_interleaved_sec":$calN%.3f,"calibration2_interleaved_sec":$calN2%.3f,"failed":${failedQ.size},"sf":"$sfDir"}""")
    // LAST: the compact per-query contract line (round-16 directive #2 —
    // the driver's bounded tail capture truncated the big line's head for
    // two rounds, so PERF's per-query comparator saw no data). One line in
    // the original driver contract shape (metric/value/unit/queries/sf),
    // small enough (~1.5 KB for 26 entries) to survive any tail window,
    // with `queries` carrying EVERY benched entry's minimum — the big
    // line's tier-1 values verbatim, plus the tier-2 and build entries
    // (additions, never renames) — and the warm build micros alongside.
    println(f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","queries":${jmap(results ++ results2 ++ resultsB)},"tier2_build_warm_sec":${jmap(resultsBWarm)},"total_headline_sec":$total%.3f,"headline_pass_min_sec":$passMin%.3f,"headline_pass_norm_min":$passNormMin%.3f,"tier2_total_sec":$total2%.3f,"tier2_build_total_sec":$totalB%.3f,"tier2_build_warm_total_sec":$totalBWarm%.3f,"calibration_sec":$calib%.3f,"calibration2_sec":$calib2%.3f,"calibration_interleaved_sec":$calN%.3f,"calibration2_interleaved_sec":$calN2%.3f,"failed":${failedQ.size},"sf":"$sfDir"}""")
    // the serve-frame memos are keyed by SF dir alone and their frames are
    // bound to THIS session (round-15 ADVICE): a later Bench/BenchScale
    // main in the same JVM must rebuild them on its own session, not
    // inherit frames pinned to a stopped one. The index DIRS stay memoized
    // — on-disk artifacts are session-independent and rebuild-expensive.
    lexServeFrames.clear()
    qualityServeFrames.clear()
    graphServeFrames.clear()
    spark.stop()
  }
}
