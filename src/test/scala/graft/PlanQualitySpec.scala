package graft

/** Plan-shape regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, true top-k) are asserted against the
  * executed plan so a future refactor can't silently lose them.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val df = Registry.byName(name).fn(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q01: null filter reaches the parquet scan, single-column read") {
    val p = planOf("q01_null_filter")
    assert(p.contains("PushedFilters: [IsNotNull(c_name)]"), p)
    assert(p.contains("ReadSchema: struct<c_name:string>"), p)
  }

  test("q03: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: the aggregate side broadcasts; the fact side never shuffles") {
    val p = planOf("q05_greatest_per_group")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j2: dimension joins are broadcast with pruned scans; fact side never sort-merges") {
    val p = planOf("j2_fk_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_totalprice:double>"), p)
    // BOTH dims (customer AND nation) must broadcast: a sort-merge join
    // here means the orders fact table shuffled on the join key
    assert(!p.contains("SortMergeJoin"),
      s"j2 fact side shuffled into a sort-merge join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected both dims broadcast in j2:\n$p")
  }

  test("w1: window rank is one hash exchange + one sort, no extra shuffles") {
    val p = planOf("w1_window_rank").split("== Initial Plan ==").head
    assert(p.contains("Window"), p)
    val nExchanges = "(?<!Broadcast)Exchange (?!SinglePartition)".r.findAllIn(p).size
    assert(nExchanges <= 1, s"w1_window_rank plans $nExchanges data exchanges:\n$p")
    // the rk <= 3 filter must push down as a rank-limit: a PARTIAL
    // WindowGroupLimit below the exchange caps each map partition's
    // contribution at k rows per group present, and the final one bounds
    // the window's input — without it the full fact table crosses the
    // wire and sorts per key (round-15 directive: this is what keeps w1's
    // upper-decade growth a shuffle-WIDTH story, not a superlinear one).
    // UnwrapCastInBinaryComparison must keep seeing through the
    // rank().cast("long") — a predicate shape it can't unwrap silently
    // loses both WindowGroupLimits.
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"w1 lost the partial+final rank-limit pushdown:\n$p")
  }

  test("w4: custom top-k-per-group plans one exchange and NO sort") {
    val p = planOf("w4_topk_per_group").split("== Initial Plan ==").head
    assert(p.contains("TopKPerGroup"), p)
    val nExchanges = "(?<!Broadcast)Exchange (?!SinglePartition)".r.findAllIn(p).size
    assert(nExchanges <= 1, s"w4_topk_per_group plans $nExchanges data exchanges:\n$p")
    assert(!p.split("TopKPerGroup").last.contains("Sort "),
      s"k-bounded heap operator must not re-sort its input:\n$p")
  }

  test("rj: range join broadcasts the band table (BroadcastNestedLoopJoin)") {
    val p = planOf("rj_range_join")
    assert(p.contains("BroadcastNestedLoop"), p)
  }

  test("tx_tfidf: one token-keyed exchange serves group-by AND window (plus tiny fan-out)") {
    // the adaptive plan string prints final + initial trees; count the final
    // tree's data-bearing shuffles (the 1-row doc-count aggregate's
    // SinglePartition exchange and its broadcast are free)
    val p = planOf("tx_tfidf").split("== Initial Plan ==").head
    val nExchanges = "(?<!Broadcast)Exchange (?!SinglePartition)".r.findAllIn(p).size
    // fan-out round-robin of the doc scan + the single token hash partition;
    // the (doc_id, token) aggregate and the token window both reuse the latter
    assert(nExchanges <= 2, s"tx_tfidf plan has $nExchanges exchanges:\n$p")
  }

  test("dd_lsh_pairs: dup pre-collapse map-side combines over ONE materialized signature projection") {
    // the dup-collapse consumes the (doc_id, sig) projection from several
    // branches (group aggregate -> reps -> bands; dup-members -> re-attach
    // joins); the expensive MinHash projection must be computed ONCE — it is
    // checkpointed, so every branch must read it back (Scan ExistingRDD),
    // never re-plan the scan. The collapse itself must be a partial
    // (map-side) aggregate, not a window (windows shuffle every row and
    // sort each partition)
    val p = planOf("dd_lsh_pairs")
    assert(p.contains("Scan ExistingRDD"),
      s"expected branches to read the checkpointed signature projection:\n$p")
    assert(!p.contains("minhash"),
      s"MinHash must not be recomputed inside the pair query:\n$p")
    assert(p.contains("partial_min"), s"pre-collapse must map-side combine:\n$p")
    assert(!p.contains("Window"), s"pre-collapse must not be a window:\n$p")
  }

  test("ev_anomaly: per-type moments are a partial-aggregatable groupBy + broadcast join, NOT a window") {
    // a window over event_type materializes each type's entire partition in
    // ONE task (window aggregates never partial-aggregate) — with a handful
    // of event types that is the whole corpus in a handful of tasks
    val p = planOf("ev_anomaly").split("== Initial Plan ==").head
    assert(p.contains("partial_avg"), s"moments must map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"moments must broadcast back:\n$p")
    assert(!p.contains("Window"), s"ev_anomaly must not window over event_type:\n$p")
  }

  test("sim_ivf: cluster assignment is a row-local expression — no window, no corpus exchange") {
    // assignment = nearest_centroids() over a single-row broadcast centroid
    // array; the ONLY hash exchange in the whole query is the final top-k
    // group exchange (the row_number-window formulation would add a
    // hashpartitioning(vec_id) exchange of corpus×k rows)
    for (name <- Seq("sim_ivf_topk", "sim_ivf_multiprobe")) {
      val p = planOf(name).split("== Initial Plan ==").head
      assert(p.contains("nearest_centroids"), s"$name: expected argmax expression:\n$p")
      assert(!p.contains("Window"), s"$name: assignment must not window:\n$p")
      val nHash = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(nHash <= 1, s"$name: $nHash hash exchanges (want just the top-k group):\n$p")
    }
  }

  test("tx_bm25: row-local scoring against one broadcast stats row — top-k, zero keyed exchanges") {
    val p = planOf("tx_bm25").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_avg"), s"corpus stats must map-side combine:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bm25 scoring must not shuffle the corpus on a key:\n$p")
  }

  test("dq_decontam_pairs: the (tiny) eval side broadcasts; train shingles never sort-merge") {
    val p = planOf("dq_decontam_pairs").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val nHash = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nHash <= 1, s"$nHash hash exchanges (want just the pair aggregate):\n$p")
  }

  test("emb_centroid_outliers: centroid is ONE map-side vector_sum aggregate; scoring is row-local") {
    val p = planOf("emb_centroid_outliers").split("== Initial Plan ==").head
    assert(p.contains("partial_vector_sum"), s"mean embedding must map-side combine:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"outlier filter must not shuffle the corpus on a key:\n$p")
  }

  test("tx_intradoc_dedup: a pure map — zero exchanges of any kind") {
    val p = planOf("tx_intradoc_dedup").split("== Initial Plan ==").head
    assert(!p.contains("Exchange"),
      s"row-local rewrite must not shuffle anything:\n$p")
  }

  test("tx_heavy_hitters: sketch pass ships only partial buffers; refine broadcasts candidates") {
    val p = planOf("tx_heavy_hitters").split("== Initial Plan ==").head
    assert(p.contains("partial_misra_gries"),
      s"sketch must aggregate map-side (partial buffers, not rows):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"candidates must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // the ONLY row-keyed exchange allowed is the exact-count of candidates
    val nHash = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nHash <= 1, s"$nHash hash exchanges (want just the refine count):\n$p")
  }

  test("dq_bloom_decontam: might_contain prefilters scan-side, under every join") {
    val p = planOf("dq_bloom_decontam").split("== Initial Plan ==").head
    val filterIdx = p.indexOf("might_contain")
    assert(filterIdx >= 0, s"no bloom prefilter in plan:\n$p")
    assert(!p.substring(filterIdx).contains("Join"),
      s"a join below the might_contain filter — prefilter is not scan-side:\n$p")
  }

  test("tx_chunking: generator fan-out is a pure map — zero exchanges") {
    val p = planOf("tx_chunking").split("== Initial Plan ==").head
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"),
      s"chunk explosion must not shuffle anything:\n$p")
  }

  test("ev_sessionize: one user-keyed exchange feeds both window passes") {
    val p = planOf("ev_sessionize").split("== Initial Plan ==").head
    val nExchanges = "(?<!Broadcast)Exchange (?!SinglePartition)".r.findAllIn(p).size
    assert(nExchanges <= 1, s"ev_sessionize plans $nExchanges data exchanges:\n$p")
  }

  test("dq_contam_score: eval trigrams broadcast; one train-id-keyed aggregate exchange") {
    val p = planOf("dq_contam_score").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // two keyed exchanges are inherent: the EVAL-side trigram distinct
    // (benchmark-sized, broadcast after) and the per-train-doc aggregate;
    // the train corpus itself shuffles only for that final aggregate
    val nHash = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nHash <= 2, s"$nHash hash exchanges (eval distinct + doc aggregate):\n$p")
  }

  test("ev_session_stats: the session aggregate reuses the window's user partitioning") {
    // ClusteredDistribution(user_id, session_id) is satisfied by the
    // window's HashPartitioning(user_id) — one corpus exchange total
    val p = planOf("ev_session_stats").split("== Initial Plan ==").head
    val nExchanges = "(?<!Broadcast)Exchange (?!SinglePartition)".r.findAllIn(p).size
    assert(nExchanges <= 1, s"ev_session_stats plans $nExchanges data exchanges:\n$p")
  }

  test("q09: scaled-long exact aggregation keeps hash (map-side partial) aggregation") {
    val p = planOf("q09_group_avg")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate"),
      s"long-backed sum should use HashAggregate, not ObjectHashAggregate:\n$p")
  }

  test("headline plan fingerprints match the committed golden file") {
    // the whole-suite regression net under the targeted guards above: any
    // lost broadcast, new exchange, or join-strategy flip in ANY headline
    // query changes its operator census and fails here, instead of
    // surfacing rounds later as bench drift
    val golden = new java.io.File("src/test/resources/headline_plan_fingerprints.txt")
    val got = Registry.all.filter(_.headline).map { q =>
      s"${q.name}: ${graft.plans.PlanFingerprint.of(planOf(q.name))}"
    }
    if (sys.props.get("graft.regenPlanFingerprints").contains("true")) {
      java.nio.file.Files.write(golden.toPath,
        got.mkString("", "\n", "\n").getBytes("UTF-8"))
      info(s"regenerated ${golden.getPath}")
    } else {
      assert(golden.isFile,
        "golden file missing — regenerate deliberately with " +
          """sbt 'set Test/javaOptions += "-Dgraft.regenPlanFingerprints=true"' """ +
          "'testOnly graft.PlanQualitySpec'")
      val want = scala.io.Source.fromFile(golden, "UTF-8").getLines().toSeq
        .filter(_.nonEmpty)
      got.zip(want).foreach { case (g, w) =>
        assert(g === w,
          "headline plan shape changed — if intentional, regenerate the " +
            "golden file with the command in the scaladoc above")
      }
      assert(got.length === want.length)
    }
  }

  test("static plan fingerprints of EVERY judged query match the golden file") {
    // breadth companion to the post-AQE headline golden above: the STATIC
    // (pre-execution) physical plan of all ~150 judged queries — catches a
    // lost broadcast or a new exchange in any judged entry. For declarative
    // entries this costs planning only; entries with an iterative build
    // step (PQ/k-means/BPE training, the ev_late_sessions MemoryStream
    // memo) execute those driver-side training jobs once at DataFrame
    // construction time, so the census is cheap but NOT free. Static plans
    // carry no runtime stats, so the census is fully deterministic; what
    // AQE alone can change at runtime (SMJ->BHJ upgrades, empty-relation
    // pruning) is exactly what the executed headline golden covers.
    val golden = new java.io.File("src/test/resources/all_plan_fingerprints_static.txt")
    val got = Registry.all.map { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      s"${q.name}: ${graft.plans.PlanFingerprint.of(plan)}"
    }
    if (sys.props.get("graft.regenPlanFingerprints").contains("true")) {
      java.nio.file.Files.write(golden.toPath,
        got.mkString("", "\n", "\n").getBytes("UTF-8"))
      info(s"regenerated ${golden.getPath}")
    } else {
      assert(golden.isFile,
        "golden file missing — regenerate deliberately with " +
          """sbt 'set Test/javaOptions += "-Dgraft.regenPlanFingerprints=true"' """ +
          "'testOnly graft.PlanQualitySpec'")
      val want = scala.io.Source.fromFile(golden, "UTF-8").getLines().toSeq
        .filter(_.nonEmpty)
      got.zip(want).foreach { case (g, w) =>
        assert(g === w,
          "a judged query's static plan shape changed — if intentional, " +
            "regenerate the golden file with the command in the scaladoc above")
      }
      assert(got.length === want.length)
    }
  }
}
