package graft

import org.apache.spark.sql.functions._

/** Machine-checked semantic contracts for the round-11 analytics additions.
  * Each judged query already hash-matches its DuckDB oracle (the driver's t2
  * gate); these tests pin the PROPERTIES the oracle compare cannot see —
  * the skyline's dominance definition against a brute-force check, PageRank's
  * mass bounds, the count-min sketch's one-sidedness over ALL tokens (the
  * judged surface filters to frequent ones), the sweep-line's distributed
  * prefix-sum identity against a single-partition recomputation, and
  * attribution's exact credit conservation.
  */
class AnalyticsSemanticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).fn(spark, sf)

  test("sk_skyline: sound (no kept part is dominated) and complete " +
    "(every dropped part is dominated by some part)") {
    val parts = graft.sources.Tables(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = parts.exists(q =>
      (q._2 < p._2 && q._3 >= p._3) || (q._2 <= p._2 && q._3 > p._3))
    val kept = run("sk_skyline").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val (keptParts, dropped) = parts.partition(p => kept(p._1))
    assert(keptParts.nonEmpty)
    keptParts.foreach(p => assert(!dominated(p),
      s"kept part $p is dominated — the banded prefix-max missed a dominator"))
    dropped.foreach(p => assert(dominated(p),
      s"dropped part $p is undominated — the frontier is incomplete"))
  }

  test("ev_pagerank: every rank carries at least the teleport base, total " +
    "mass never exceeds the initial scale, and ranks sum to a probability") {
    val rows = run("ev_pagerank")
      .select("node", "rank_scaled").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = rows.length
    assert(n > 1)
    val base = 150000000000L / n
    rows.foreach { case (node, r) =>
      assert(r >= base, s"$node rank $r below the damping floor $base")
    }
    // floor() in the per-edge chain only ever LOSES mass vs exact 0.85
    // damping, so the total can never exceed the initial 1e12 — and ten
    // iterations of ≤5-node floors cannot lose more than a few ppm
    val total = rows.map(_._2).sum
    assert(total <= 1000000000000L, s"mass grew: $total")
    assert(total > 990000000000L, s"floor losses too large: $total")
  }

  test("tx_cms_freq: the sketch estimate is one-sided over EVERY token, " +
    "not just the judged frequent slice") {
    // rebuild the full (unfiltered) estimate table with the query's exact
    // bucket derivation, then assert est >= exact universally
    val tf = graft.sources.Tables(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
    val keyed = tf.select(col("token"), col("n_exact"),
      explode(array((0 to 2).map(r => struct(lit(r).as("r"),
        conv(substring(md5(col("token")), 1 + 3 * r, 3), 16, 10)
          .cast("long").as("bucket"))): _*)).as("rb"))
      .select(col("token"), col("n_exact"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val counters = keyed.groupBy("r", "bucket").agg(sum(col("n_exact")).as("c"))
    val est = keyed.join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("token")
      .agg(max(col("n_exact")).as("n_exact"), min(col("c")).as("est"))
    val under = est.filter(col("est") < col("n_exact")).count()
    assert(under == 0, s"$under tokens underestimated — CMS must be one-sided")
    // and the judged slice is exactly the est table filtered to n_exact>=20
    assert(rowSet(run("tx_cms_freq")) ==
      rowSet(est.filter(col("n_exact") >= 20)))
  }

  test("ev_concurrency: the day-keyed two-phase prefix sum equals the " +
    "naive single-sweep running max per day") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val spans = graft.sources.Tables(spark, sf, "events")
      .withColumn("brk",
        when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
    // naive sweep in one driver-side pass (fixture-scale only)
    val deltas = spans.flatMap { case (u, s, st, en) =>
      Seq((st, 1L, u, s), (en, -1L, u, s))
    }.sortBy { case (ts, d, u, s) => (ts.getTime, -d, u, s) }
    var runSum = 0L
    val naive = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    deltas.foreach { case (ts, d, _, _) =>
      runSum += d
      val day = ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
      naive(day) = math.max(naive.getOrElse(day, Long.MinValue), runSum)
    }
    val engine = run("ev_concurrency").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(engine == naive.toMap,
      "two-phase prefix sum diverged from the naive sweep")
  }

  test("ev_attribution: total credit equals purchases with predecessors " +
    "up to bounded floor loss, and every credit is nonnegative") {
    val rows = run("ev_attribution")
      .select("event_type", "credit_micro", "n_touches").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (t, c, n) =>
      assert(c >= 0 && n > 0, s"$t: credit $c touches $n")
    }
    // each attributed purchase distributes n_prec * (1e6 div n_prec)
    // micro-credits: at most 1e6, short by less than n_prec ulps — so the
    // grand total sits in (purchases * (1e6 - max_session_len), purchases * 1e6]
    val sess = Registry.byName("ev_sessionize").fn(spark, sf)
    val totalCredit = rows.map(_._2).sum
    val purchases = run("ev_markov") // purchases with predecessors == sum over
      .filter(col("next_type") === "purchase") // transitions INTO purchase
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(totalCredit <= purchases * 1000000L,
      s"credit $totalCredit exceeds ${purchases}e6")
    assert(totalCredit > (purchases - 1) * 1000000L - purchases * 1000L,
      s"credit $totalCredit lost more than floor rounding allows")
    assert(sess.count() > 0) // the sessionizer the attribution shares stays live
  }

  test("dd_containment: containment >= jaccard on every scored pair " +
    "(|∩|/min dominates |∩|/|∪| by definition)") {
    val cont = run("dd_containment")
      .select(col("doc_a"), col("doc_b"), col("containment"))
    val jac = graft.operators.Dedup.jaccardPairs(
      graft.sources.Tables(spark, sf, "documents"),
      col("doc_id"), col("text"), threshold = 0.0)
    val joined = cont.join(jac, Seq("doc_a", "doc_b"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.6 && c <= 1.0 + 1e-12)
      if (!r.isNullAt(3)) assert(c >= r.getDouble(3) - 1e-12,
        s"pair (${r.getLong(0)},${r.getLong(1)}): containment $c < jaccard")
    }
  }

  test("tx_ngram_novelty: per-doc counts are consistent and the unique-gram " +
    "total matches the corpus df=1 census") {
    val nov = run("tx_ngram_novelty").collect()
    nov.foreach { r =>
      val (n, u, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u >= 0 && u <= n && f >= 0.0 && f <= 1.0, r.toString)
    }
    val grams = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3))
          .as("gram"))
    val df1 = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") === 1).count()
    assert(nov.map(_.getLong(2)).sum == df1,
      "sum of per-doc unique grams must equal the corpus df=1 gram count")
  }

  test("ev_cohort_ltv: ltv is the running sum of revenue per cohort and " +
    "grid revenue conserves the direct purchase total") {
    val rows = run("ev_cohort_ltv")
      .select("cohort_week", "week_offset", "revenue", "ltv").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      var cum = BigDecimal(0)
      g.sortBy(_._2).foreach { case (_, _, rev, ltv) =>
        cum += BigDecimal(rev)
        // both sides are 6dp-rounded projections of the same exact longs
        assert((BigDecimal(ltv) - cum).abs <= BigDecimal("0.000002"))
      }
    }
    val direct = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 1000000, 0).cast("long"))).collect()(0).getLong(0)
    val grid = rows.map(r => BigDecimal(r._3)).sum
    assert((grid - BigDecimal(direct) / 1000000).abs <= BigDecimal("0.01"),
      s"grid revenue $grid vs direct ${BigDecimal(direct) / 1000000}")
  }

  test("emb_anisotropy: bucket counts sum to the stride-pair count and " +
    "means sit inside their buckets") {
    val rows = run("emb_anisotropy").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val vecs = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = vecs.count(v => vecs(v + 97))
    assert(rows.map(_._2).sum == expected,
      "every stride pair must land in exactly one bucket")
    rows.foreach { case (b, _, m) =>
      assert(m >= b / 10.0 - 1e-9 && m < (b + 1) / 10.0 + 1e-9,
        s"bucket $b mean $m outside [${b / 10.0}, ${(b + 1) / 10.0})")
    }
  }

  test("cp_pack_efficiency: token totals conserve the raw corpus and bin " +
    "counts match the packing's max bin id") {
    val effRows = run("cp_pack_efficiency").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val packed = run("tx_seq_packing").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = packed.groupBy(_._1)
    effRows.foreach { case (src, nBins, nTokens) =>
      val g = bySrc(src)
      assert(nTokens == g.map(_._2).sum, s"$src token conservation")
      assert(nBins == g.map(_._3).max + 1, s"$src bin census")
    }
    assert(effRows.map(_._1).toSet == bySrc.keySet)
  }

  test("tx_zipf: the head vocabulary follows a negative power law") {
    val r = run("tx_zipf").collect()(0)
    val vocab = graft.sources.Tables(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token")).select("token").distinct().count()
    assert(r.getLong(0) == math.min(200L, vocab),
      "regression must run on the full head (top-200 or the whole vocab)")
    val slope = r.getDouble(1)
    assert(slope < 0, s"Zipf slope must be negative, got $slope")
    assert(slope > -3, s"implausibly steep slope $slope")
  }

  test("ev_markov: outgoing probabilities sum to 1 per prev_type within " +
    "rounding, and transition counts conserve") {
    val perPrev = run("ev_markov").groupBy("prev_type")
      .agg(sum(col("p")).as("psum"), count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    perPrev.foreach { case (t, psum, k) =>
      // each of the k addends is rounded to 6dp: |psum - 1| <= k * 5e-7
      assert(math.abs(psum - 1.0) <= k * 5e-7 + 1e-12,
        s"$t: P(next|$t) sums to $psum over $k transitions")
    }
  }
}
