package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompositionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, source, n_chars) — sourceA: 4 docs, sourceB: 2, sourceC: 3
    (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
    (5L, "b", 50L), (6L, "b", 60L),
    (7L, "c", 10L), (8L, "c", 20L), (9L, "c", 30L)
  ).toDF("doc_id", "source", "n_chars")

  test("domainQuota keeps the quota best per domain, ties to larger id") {
    val kept = Composition.domainQuota(docs, "source", Seq("n_chars", "doc_id"), 2)
      .select("doc_id").as[Long].collect().toSet
    // a: 300s win, tie between ids 2 and 4 is irrelevant (both kept)
    // b: both kept (under quota); c: 30 and 20
    assert(kept === Set(2L, 4L, 5L, 6L, 8L, 9L))
  }

  test("domainQuota at quota 1 keeps exactly one row per domain") {
    val kept = Composition.domainQuota(docs, "source", Seq("n_chars", "doc_id"), 1)
      .select("source", "doc_id").as[(String, Long)].collect().toMap
    assert(kept === Map("a" -> 4L, "b" -> 6L, "c" -> 9L))
  }

  test("mixtureSample: tightest source kept whole, rates proportional, deterministic") {
    // weights: a=0.5, c=0.5 -> C = min(4/0.5, 3/0.5) = 6
    //   a: rate = 6*0.5/4 = 0.75; c: rate = 6*0.5/3 = 1.0 (kept whole)
    //   b: absent from targets -> dropped
    val out = Composition.mixtureSample(docs, col("source"), col("doc_id"),
      Seq("a" -> 0.5, "c" -> 0.5))
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(!kept.exists(Set(5L, 6L)), "non-target source must be dropped")
    assert(Set(7L, 8L, 9L).subsetOf(kept.toSet), "rate-1.0 source keeps every row")
    // determinism: same inputs -> identical membership, any partitioning
    val again = Composition.mixtureSample(docs.repartition(7), col("source"),
      col("doc_id"), Seq("a" -> 0.5, "c" -> 0.5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === again)
  }

  test("mixtureSample approaches target proportions on a large corpus") {
    val big = spark.range(0, 30000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "web").when(col("id") % 10 < 9, "wiki")
        .otherwise("books").as("source"))
    // availability: web 60%, wiki 30%, books 10%; target 50/25/25
    // books is tightest: C = 3000/0.25 = 12000 -> expect ~6000/3000/3000
    val out = Composition.mixtureSample(big, col("source"), col("doc_id"),
      Seq("web" -> 0.5, "wiki" -> 0.25, "books" -> 0.25))
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts("books") === 3000L, "tightest source is kept whole")
    assert(math.abs(counts("web") - 6000L) < 300, counts.toString)
    assert(math.abs(counts("wiki") - 3000L) < 200, counts.toString)
  }

  test("mixtureSample: a target source with zero corpus rows empties the " +
      "output instead of silently re-weighting the mixture") {
    // 'wiki' is in the targets but not the corpus: C = min(..., 0/0.5) = 0,
    // so NO source can contribute rows without violating the proportions —
    // an inner counts⋈targets join would instead drop wiki and emit a
    // 100%-'a' corpus that looks healthy while missing an ingredient
    val out = Composition.mixtureSample(docs, col("source"), col("doc_id"),
      Seq("a" -> 0.5, "wiki" -> 0.5))
    assert(out.isEmpty, "unachievable mixture must be loudly empty")
  }

  test("temperatureSample: smallest source kept whole, larger flattened " +
      "toward it, deterministic across partitionings") {
    // sizes a=4, b=2, c=3; alpha=0.5 -> rate_s = sqrt(2/n_s): b kept whole,
    // a at sqrt(1/2)≈0.707, c at sqrt(2/3)≈0.816 — the filter form is
    // u²·n < n_min (exact IEEE ops, no pow)
    val out = Composition.temperatureSample(docs, col("source"), col("doc_id"),
      alpha = 0.5)
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(Set(5L, 6L).subsetOf(kept.toSet), "the smallest source is kept whole")
    val again = Composition.temperatureSample(docs.repartition(7), col("source"),
      col("doc_id"), alpha = 0.5).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === again, "membership must be a pure function of the id")
  }

  test("temperatureSample at alpha 0 equalizes expected source sizes") {
    // alpha=0 -> rate_s = n_min/n_s: every source targets n_min rows in
    // expectation; on a large skewed corpus the realized sizes concentrate
    val big = spark.range(0, 30000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "web").when(col("id") % 10 < 9, "wiki")
        .otherwise("books").as("source"))
    val counts = Composition.temperatureSample(big, col("source"), col("doc_id"),
      alpha = 0.0).groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("books") === 3000L, "the smallest source is kept whole")
    assert(math.abs(counts("web") - 3000L) < 300, counts.toString)
    assert(math.abs(counts("wiki") - 3000L) < 300, counts.toString)
  }

  test("mixtureEpochs replicates each source to its target share with " +
      "contiguous per-doc epochs") {
    // targets 50/50 over a(n=4)/b(n=2), totalRows=12:
    //   r_a = 6/4 = 1.5 (1-2 epochs per doc), r_b = 6/2 = 3.0 (exactly 3)
    val out = Composition.mixtureEpochs(docs.select("doc_id", "source"),
      col("source"), col("doc_id"), Seq("a" -> 0.5, "b" -> 0.5), totalRows = 12L)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Long)].collect().toSeq
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    assert(byDoc.keySet.intersect(Set(7L, 8L, 9L)).isEmpty,
      "non-target sources are dropped")
    Seq(5L, 6L).foreach(id => assert(byDoc(id) === Seq(0L, 1L, 2L),
      s"integer rate 3.0 must replicate doc $id exactly 3 times"))
    byDoc.foreach { case (id, epochs) =>
      assert(epochs === (0L until epochs.length).toSeq,
        s"doc $id epochs must be contiguous from 0")
    }
    val aRows = out.count(_._2 == "a")
    assert(aRows >= 4 && aRows <= 8, s"rate 1.5 over 4 docs emits 4..8, got $aRows")
    val again = Composition.mixtureEpochs(
      docs.repartition(5).select("doc_id", "source"),
      col("source"), col("doc_id"), Seq("a" -> 0.5, "b" -> 0.5), totalRows = 12L)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Long)].collect().toSeq
    assert(out.sorted === again.sorted, "the emitted multiset is deterministic")
  }

  test("chained samplers compose: mixture proportions hold on a " +
      "temperature-sampled corpus (stage uniforms are decorrelated)") {
    // web 18000 / wiki 9000 / books 3000. Temperature 0.5 keeps books whole
    // and samples web at sqrt(1/6) ≈ 0.408 (~7348). The mixture stage then
    // wants web at rate ≈ 0.95 of the TEMPERED frame. With a SHARED
    // uniform, every tempered web survivor would already satisfy u < 0.408
    // < 0.95, so the mixture filter would keep ALL of them (~7348) instead
    // of its declared ~7000 — the nesting bug distinct salts exist to
    // prevent.
    val big = spark.range(0, 30000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "web").when(col("id") % 10 < 9, "wiki")
        .otherwise("books").as("source"))
    val tempered = Composition.temperatureSample(big, col("source"),
      col("doc_id"), alpha = 0.5)
    val mixed = Composition.mixtureSample(tempered, col("source"),
      col("doc_id"), Seq("web" -> 0.7, "books" -> 0.3))
    val counts = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!counts.contains("wiki"), "non-target source dropped")
    assert(counts("books") === 3000L, "tightest source kept whole")
    // C = min(n_web/0.7, 3000/0.3) = 10000 -> web target exactly 7000
    assert(math.abs(counts("web") - 7000L) < 300,
      s"chained web count ${counts("web")} must honor the mixture rate, " +
        "not the nested-uniform count (~7348)")
    // NONZERO-salt pair (temperature salt 1 -> epoch-draw salt 2): the
    // first shipped salting decorrelated each salt only against salt 0 —
    // any two nonzero salts were constant rotations of each other, so the
    // fractional-epoch draw over temperature survivors was all-or-nothing
    // (their salt-2 uniforms occupied one interval). The declared rate must
    // hold over the CHAINED population.
    val temperedWeb = tempered.filter(col("source") === "web")
    val nWeb = temperedWeb.count()
    val rows = Composition.mixtureEpochs(temperedWeb, col("source"),
      col("doc_id"), Seq("web" -> 1.0), totalRows = nWeb * 3 / 2).count()
    assert(math.abs(rows - nWeb * 1.5) < nWeb * 0.05,
      s"fractional epochs over tempered web: got $rows of ~${nWeb * 3 / 2} " +
        "(all-or-nothing means the salts are still correlated)")
  }

  test("property: sampler contracts hold on random corpora and targets") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      sizes <- Gen.listOfN(3, Gen.choose(1, 60))
      w1 <- Gen.choose(1, 8)
      w2 <- Gen.choose(1, 8)
      total <- Gen.choose(1, 200)
      parts <- Gen.choose(1, 7)
      idBase <- Gen.choose(0L, 1000000L)
    } yield (sizes, w1, w2, total, parts, idBase)
    val prop = Prop.forAllNoShrink(gen) {
      case (sizes, w1, w2, total, parts, idBase) =>
        val names = Seq("s0", "s1", "s2")
        val rows = names.zip(sizes).flatMap { case (s, n) =>
          (0 until n).map(i => (idBase + names.indexOf(s) * 1000 + i, s))
        }
        val df = rows.toDF("doc_id", "source").repartition(parts)
        val targets = Seq("s0" -> w1.toDouble / (w1 + w2),
          "s1" -> w2.toDouble / (w1 + w2))
        // mixtureSample: never upsamples; the binding source is kept whole;
        // non-target sources drop
        val mixed = Composition.mixtureSample(df, col("source"), col("doc_id"),
          targets).groupBy("source").count().as[(String, Long)].collect().toMap
        val n0 = sizes(0).toDouble; val n1 = sizes(1).toDouble
        val binding = if (n0 / targets(0)._2 <= n1 / targets(1)._2) "s0" else "s1"
        val noUpsample = mixed.getOrElse("s0", 0L) <= sizes(0) &&
          mixed.getOrElse("s1", 0L) <= sizes(1) && !mixed.contains("s2")
        val bindingWhole = mixed.getOrElse(binding, 0L) ==
          sizes(names.indexOf(binding))
        // mixtureEpochs: per-doc epochs in {floor(r), ceil(r)}, contiguous
        val eps = Composition.mixtureEpochs(df, col("source"), col("doc_id"),
          targets, total.toLong)
          .select("doc_id", "source", "epoch")
          .as[(Long, String, Long)].collect().toSeq
        val rOf = Map(
          "s0" -> total * targets(0)._2 / n0,
          "s1" -> total * targets(1)._2 / n1)
        val perDoc = eps.groupBy(_._1)
        val epochsOk = perDoc.forall { case (_, rs) =>
          val r = rOf(rs.head._2)
          val es = rs.map(_._3).sorted
          es == (0L until es.length) &&
            (es.length == math.floor(r).toLong || es.length == math.ceil(r).toLong)
        }
        // temperatureSample: smallest source kept whole, none upsampled
        val temp = Composition.temperatureSample(df, col("source"),
          col("doc_id"), alpha = 0.5)
          .groupBy("source").count().as[(String, Long)].collect().toMap
        val minSrc = names(sizes.indexOf(sizes.min))
        val tempOk = temp.getOrElse(minSrc, 0L) == sizes.min &&
          names.zip(sizes).forall { case (s, n) => temp.getOrElse(s, 0L) <= n }
        noUpsample && bindingWhole && epochsOk && tempOk
    }
    val result = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("mixtureEpochs rejects malformed inputs") {
    intercept[IllegalArgumentException] {
      Composition.mixtureEpochs(docs, col("source"), col("doc_id"),
        Seq("a" -> 0.7, "b" -> 0.7), 10L)
    }
    intercept[IllegalArgumentException] {
      Composition.mixtureEpochs(docs, col("source"), col("doc_id"),
        Seq("a" -> 1.0), 0L)
    }
  }

  test("shardOrder: contiguous positions per shard, deterministic, near-balanced") {
    val n = 8000L
    val ids = spark.range(0, n).select(col("id").as("doc_id"))
    val out = Composition.shardOrder(ids, col("doc_id"), nShards = 8)
      .select("doc_id", "shard", "pos")
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("maxPos"), min("pos").as("minPos"))
      .as[(Long, Long, Long, Long)].collect()
    assert(byShard.length === 8)
    byShard.foreach { case (sh, cnt, maxPos, minPos) =>
      assert(minPos === 1L && maxPos === cnt, s"shard $sh positions not contiguous")
      assert(math.abs(cnt - n / 8) < 200, s"shard $sh unbalanced: $cnt")
    }
    // deterministic across partitionings
    val again = Composition.shardOrder(ids.repartition(13), col("doc_id"), 8)
      .select("doc_id", "shard", "pos")
    assert(rowSet(out) === rowSet(again))
  }

  test("curriculumOrder: phases never interleave within a shard, same " +
      "shard assignment as shardOrder, hash-shuffled within each phase") {
    val n = 4000L
    val ids = spark.range(0, n).select(col("id").as("doc_id"),
      (col("id") % 3).cast("int").as("phase"))
    val out = Composition.curriculumOrder(ids, col("doc_id"),
      col("phase"), nShards = 8)
      .select("doc_id", "phase", "shard", "pos")
      .localCheckpoint()
    // within every shard, every phase-p position precedes every phase-p+1
    // position: max(pos) of each phase < min(pos) of the next
    val ranges = out.groupBy("shard", "phase")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(_._1).values
    ranges.foreach { shardPhases =>
      val sorted = shardPhases.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((sh, _, _, hi, _), (_, _, lo, _, _)) =>
          assert(hi < lo, s"phases interleave in shard $sh")
        case _ => ()
      }
      // contiguous positions across the whole shard
      val total = sorted.map(_._5).sum
      assert(sorted.map(_._3).min === 1L && sorted.map(_._4).max === total)
    }
    // the shard key is shardOrder's (salt 3): curriculum reorders WITHIN
    // shards, it never moves a doc between them
    val plain = Composition.shardOrder(ids.select("doc_id"),
      col("doc_id"), nShards = 8).select("doc_id", "shard")
    assert(rowSet(out.select("doc_id", "shard")) === rowSet(plain))
    // within a phase the order is the salted hash, not doc_id: positions
    // of consecutive ids must not be globally monotone
    val phase0 = out.filter(col("phase") === 0 && col("shard") === 0)
      .orderBy("pos").select("doc_id").as[Long].collect()
    assert(phase0.length > 10)
    assert(!phase0.sameElements(phase0.sorted),
      "within-phase order must be hash-shuffled, not id order")
  }

  test("mixtureSample rejects malformed targets") {
    intercept[IllegalArgumentException] {
      Composition.mixtureSample(docs, col("source"), col("doc_id"),
        Seq("a" -> 0.5, "c" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Composition.mixtureSample(docs, col("source"), col("doc_id"), Seq())
    }
  }

  test("tokenMixtureSample: token-binding source kept whole, non-target " +
      "dropped, deterministic across partitionings") {
    // token sums: a = 4×100 = 400, c = 10+20+30 = 60 (n_chars stands in for
    // tokens). Targets 0.5/0.5 → C = min(400/0.5, 60/0.5) = 120 → rate_a =
    // 120·0.5/400 = 0.15, rate_c = 1.0 (the TOKEN-tightest source is kept
    // whole even though it has MORE docs than budget-equivalent a-share)
    val toks = docs.withColumn("n_tokens",
      when(col("source") === "a", lit(100L)).otherwise(col("n_chars")))
    val out = Composition.tokenMixtureSample(toks, col("source"),
      col("doc_id"), col("n_tokens"), Seq("a" -> 0.5, "c" -> 0.5))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.exists(Set(5L, 6L)), "non-target source must be dropped")
    assert(Set(7L, 8L, 9L).subsetOf(kept), "rate-1.0 source keeps every row")
    val again = Composition.tokenMixtureSample(toks.repartition(7),
      col("source"), col("doc_id"), col("n_tokens"),
      Seq("a" -> 0.5, "c" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === again)
  }

  test("tokenMixtureSample approaches target TOKEN shares where a doc-count " +
      "mixture would skew toward the short-doc source") {
    // web: 6000 docs × 100 tokens = 600k; wiki: 3000 × 200 = 600k;
    // books: 1000 × 50 = 50k. Targets 0.5/0.25/0.25 → C =
    // min(1.2M, 2.4M, 200k) = 200k → kept token budgets 100k/50k/50k —
    // books (token-tightest) kept whole. A doc-count mixture at the same
    // targets would key C off doc counts (books 1000/0.25 = 4000) and keep
    // 2000 web DOCS = 200k web tokens: double the declared token share.
    val big = spark.range(0, 10000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "web").when(col("id") % 10 < 9, "wiki")
        .otherwise("books").as("source"))
      .withColumn("n_tokens",
        when(col("source") === "web", 100L)
          .when(col("source") === "wiki", 200L).otherwise(50L))
    val out = Composition.tokenMixtureSample(big, col("source"),
      col("doc_id"), col("n_tokens"),
      Seq("web" -> 0.5, "wiki" -> 0.25, "books" -> 0.25))
    val tok = out.groupBy("source").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(tok("books") === 50000L, "token-tightest source kept whole")
    assert(math.abs(tok("web") - 100000L) < 10000, tok.toString)
    assert(math.abs(tok("wiki") - 50000L) < 7000, tok.toString)
  }

  test("tokenMixtureSample: salt-5 draw composes with the doc-count " +
      "mixture instead of nesting") {
    // Chain mixtureSample (salt 0, web rate C·w/n < 1) then
    // tokenMixtureSample over the SURVIVORS: with a shared uniform every
    // survivor would already satisfy u < r1, so a second-stage rate r2 > r1
    // would keep ALL of them; with decorrelated draws it keeps ~r2.
    val big = spark.range(0, 30000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "web").otherwise("books").as("source"))
      .withColumn("n_tokens", lit(100L))
    val first = Composition.mixtureSample(big, col("source"), col("doc_id"),
      Seq("web" -> 0.5, "books" -> 0.5))
    val nWeb = first.filter(col("source") === "web").count().toDouble
    val nBooks = first.filter(col("source") === "books").count().toDouble
    // uniform token lengths → the token mixture's rates mirror doc rates:
    // binding side books (kept whole), web at (nBooks/0.6)·0.4/nWeb ≈ 0.67
    val second = Composition.tokenMixtureSample(first, col("source"),
      col("doc_id"), col("n_tokens"), Seq("web" -> 0.4, "books" -> 0.6))
    val webKept = second.filter(col("source") === "web").count().toDouble
    val expect = math.min(1.0, (nBooks / 0.6) * 0.4 / nWeb) * nWeb
    assert(math.abs(webKept - expect) < nWeb * 0.05,
      s"chained web kept $webKept, expected ~$expect (all-or-nothing means " +
        "the salt-5 draw is correlated with salt 0)")
  }

  test("temperatureCurve: the e=2 row reproduces temperatureSample(alpha=0.5) " +
      "counts, shares sum to 1, sampling never exceeds the source") {
    import org.apache.spark.sql.functions._
    val many = spark.range(0, 500).select(col("id").as("doc_id"),
      when(col("id") % 10 < 6, "big").otherwise("small").as("source"))
    val curve = Composition.temperatureCurve(many, col("source"),
      col("doc_id"), maxE = 4).collect()
    val direct = Composition.temperatureSample(many, col("source"),
        col("doc_id"), alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e2 = curve.filter(_.getLong(0) == 2L)
      .map(r => r.getString(2) -> r.getLong(4)).toMap
    assert(e2 === direct, "e=2 slice must equal the deployed alpha=0.5 sample")
    for (e <- 1L to 4L) {
      val rows = curve.filter(_.getLong(0) == e)
      assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-12)
      assert(rows.forall(r => r.getLong(4) <= r.getLong(3)),
        "sampled count must never exceed the source size")
    }
  }

  test("budgetFill: water-filling conserves the budget, caps at availability, " +
      "and degenerates to exact proportional split when nothing saturates") {
    import org.apache.spark.sql.functions._
    val avail = Seq(("a", 1000L), ("b", 50L), ("c", 1000L)).toDF("source", "a")
    val out = Composition.budgetFill(avail,
        Seq("a" -> 1L, "b" -> 1L, "c" -> 2L), budget = 400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // b wants 100 but has 50 → saturates; remainder 350 splits 1:2
    assert(out("b") === ((50L, 1L, 1L, 50L)))
    assert(out("a") === ((1000L, 1L, 0L, 116L))) // floor(350*1/3)
    assert(out("c") === ((1000L, 2L, 0L, 233L))) // floor(350*2/3)
    assert(out.values.map(_._4).sum <= 400L)
    assert(out.values.forall { case (a, _, _, x) => x <= a })

    // nothing saturates → exact proportional floor split of the budget
    val flat = Composition.budgetFill(avail,
        Seq("a" -> 1L, "b" -> 1L, "c" -> 2L), budget = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(flat === Map("a" -> 25L, "b" -> 25L, "c" -> 50L))

    // budget above total availability → everyone saturates at what they have
    val rich = Composition.budgetFill(avail,
        Seq("a" -> 1L, "b" -> 1L, "c" -> 2L), budget = 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rich === Map("a" -> 1000L, "b" -> 50L, "c" -> 1000L))
  }

  test("tokenMixtureSample: a target source with zero tokens empties the " +
      "output instead of silently re-weighting") {
    val toks = docs.withColumn("n_tokens", col("n_chars"))
    val out = Composition.tokenMixtureSample(toks, col("source"),
      col("doc_id"), col("n_tokens"), Seq("a" -> 0.5, "wiki" -> 0.5))
    assert(out.isEmpty, "unachievable token mixture must be loudly empty")
  }
}
