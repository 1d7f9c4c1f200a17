package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion of two lists, absence contributes zero") {
    // list A ranks (by score desc, id asc): 10 -> r1, 20 -> r2, 30 -> r3
    val a = Seq((0L, 10L, 0.9), (0L, 20L, 0.8), (0L, 30L, 0.7))
      .toDF("query_id", "id", "score")
    // list B ranks: 20 -> r1, 40 -> r2
    val b = Seq((0L, 20L, 5.0), (0L, 40L, 4.0)).toDF("query_id", "id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), c = 60, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(
      10L -> rnd(rr(1)),
      20L -> rnd(rr(2) + rr(1)), // in both lists: contributions sum
      30L -> rnd(rr(3)),
      40L -> rnd(rr(2))))
    // the doubly-listed candidate outranks every single-list one here
    val top = Retrieval.rrfFuse(Seq(a, b), c = 60, k = 1).collect()
    assert(top.length === 1 && top.head.getLong(1) === 20L)
  }

  test("rrfFuse: per-query isolation, equal-score ties rank by id, k bounds output") {
    // query 1's candidates must not leak into query 0's ranks
    val a = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1.0))
      .toDF("query_id", "id", "score")
    val got = Retrieval.rrfFuse(Seq(a), c = 60, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def rr(r: Int) = BigDecimal(1.0 / (60 + r))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // tie between ids 2 and 3 at score 1.0: rank by id asc -> 2 wins rank 1
    assert(got === Set((0L, 1L, rr(1)), (1L, 2L, rr(1))))
  }

  test("contrastiveTriplets: positive is the best same-label neighbor, " +
      "negatives are the hard-negative set, margin is their sim difference") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.contrastiveTriplets(emb, queries, kNeg = 5, simUpper = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val sims = Similarity.bruteForceTopK(emb, queries, k = emb.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (q, p, n, margin) =>
      assert(labels(q) == labels(p), s"positive ($q, $p) must share the label")
      assert(labels(q) != labels(n), s"negative ($q, $n) must not share the label")
      val want = BigDecimal(sims((q, p)) - sims((q, n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(margin === want, s"margin for ($q, $p, $n)")
    }
    // per query: exactly one positive (the argmax same-label sim), and the
    // negative set equals hardNegatives
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"query $q has >1 positive")
      val bestPos = sims.collect { case ((`q`, n), s) if labels(q) == labels(n) => (n, s) }
        .toSeq.sortBy(r => (-r._2, r._1)).head._1
      assert(rows.head._2 === bestPos, s"query $q positive is not the argmax")
    }
    val hn = Similarity.hardNegatives(emb, queries, k = 5, simUpper = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tripletNegs = got.map(r => (r._1, r._3)).toSet
    assert(tripletNegs.subsetOf(hn),
      "triplet negatives must come from the hard-negative set")
  }

  test("property: rrfFuse equals a reference model on random lists") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // reference model: per list rank by (score DESC, id ASC), contribute
    // 1/(c+rank), sum per (query, id) in LIST-INDEX order (the operator's
    // documented fold order), round 6dp, top-k by (rrf DESC, id ASC)
    def ref(lists: Seq[Seq[(Long, Long, Double)]], c: Int, k: Int) = {
      val contribs = scala.collection.mutable
        .Map.empty[(Long, Long), List[(Int, Double)]]
      lists.zipWithIndex.foreach { case (rows, li) =>
        rows.groupBy(_._1).foreach { case (q, qRows) =>
          qRows.sortBy(r => (-r._3, r._2)).zipWithIndex.foreach {
            case ((_, id, _), i) =>
              contribs((q, id)) =
                contribs.getOrElse((q, id), Nil) :+ (li, 1.0 / (c + i + 1))
          }
        }
      }
      contribs.toSeq.map { case ((q, id), cs) =>
        val s = cs.sortBy(_._1).foldLeft(0.0)((a, x) => a + x._2)
        (q, id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k)
      }.toSet
    }
    val listGen = for {
      nC <- Gen.choose(0, 8)
      ids <- Gen.pick(nC, 0L until 20L)
      scores <- Gen.listOfN(nC, Gen.choose(1, 40))
    } yield ids.toSeq.zip(scores).map { case (id, s) => (id, s.toDouble / 4) }
    val gen = for {
      nLists <- Gen.choose(1, 3)
      k <- Gen.choose(1, 6)
      perQ <- Gen.listOfN(nLists, Gen.listOfN(2, listGen))
    } yield (perQ.map(qs => qs.zipWithIndex.flatMap { case (rows, q) =>
      rows.map { case (id, s) => (q.toLong, id, s) }
    }), k)
    val prop = Prop.forAllNoShrink(gen) { case (lists, k) =>
      val dfs = lists.map(rows => rows.toDF("query_id", "id", "score"))
      val got = Retrieval.rrfFuse(dfs, c = 60, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = ref(lists, 60, k)
      if (got != want) {
        info(s"lists=$lists k=$k\n got=$got\nwant=$want")
      }
      got == want
    }
    val result = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("end-to-end hybrid serving: LexIndex + IvfIndex lists fuse through rrfFuse") {
    // the production hybrid-retrieval stack, entirely from PERSISTED
    // indexes: the lexical leg serves BM25 from pruned posting lists, the
    // vector leg serves cosine from pruned cluster partitions, and fusion
    // needs only their (query_id, id, score) outputs
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("hybrid").toString
    val docs = graft.sources.Tables(spark, sf, "documents").select("doc_id", "text")
    val emb = graft.sources.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    LexIndex.build(docs, s"$dir/lex", buckets = 16)
    IvfIndex.build(emb, k = 8, iters = 2, dim = 64, s"$dir/ivf")
    val lex = LexIndex.searchTopK(spark, s"$dir/lex",
        Seq("dup", "vector", "window"), k = 20)
      .select(lit(0L).as("query_id"), col("doc_id").as("id"), col("bm25").as("score"))
    val vec = IvfIndex.searchTopK(spark, s"$dir/ivf",
        emb.filter(col("vec_id") === 0), k = 20, probes = 2)
      .select(col("query_id"), col("neighbor_id").as("id"), col("sim").as("score"))
    val fused = Retrieval.rrfFuse(Seq(lex, vec), c = 60, k = 10).collect()
    assert(fused.length === 10)
    // every fused id came from one of the two lists, and scores are the
    // rank-reciprocal sums the lists imply
    val lexIds = lex.select("id").collect().map(_.getLong(0)).toSet
    val vecIds = vec.select("id").collect().map(_.getLong(0)).toSet
    fused.foreach { r =>
      assert(lexIds.contains(r.getLong(1)) || vecIds.contains(r.getLong(1)))
      assert(r.getDouble(2) > 0)
    }
    // a doc ranked in BOTH lists must outrank the same-rank single-list doc
    val both = fused.filter(r =>
      lexIds.contains(r.getLong(1)) && vecIds.contains(r.getLong(1)))
    if (both.nonEmpty) {
      val bestBoth = both.map(_.getDouble(2)).max
      assert(bestBoth > 1.0 / 61 || fused.forall(_.getDouble(2) <= bestBoth))
    }
  }

  test("hardNegatives: no same-label neighbor, matches filtered brute force, cap respected") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.hardNegatives(emb, queries, k = 5, simUpper = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (q, n, sim) =>
      assert(labels(q) !== labels(n), s"same-label pair ($q, $n) served as negative")
      assert(sim < 0.95, s"similarity cap violated: ($q, $n) at $sim")
    }
    // reference: brute-force top-k over the label-filtered candidate set
    val bf = Similarity.bruteForceTopK(emb, queries, k = emb.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (q, n, sim) => labels(q) != labels(n) && sim < 0.95 }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).toSeq
      }.toSet
    assert(got.toSet === bf, "hardNegatives must equal label-filtered brute force")
  }

  test("mmrTopK: lambda=1 reduces to the plain cosine top-k; ranks are " +
      "contiguous; violations are empty on the fixture") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 8)
    val queries = emb.filter(col("vec_id") < 4)
    val mmr = Retrieval.mmrTopK(corpus, queries,
      candidates = 10, k = 5, lambda = 1.0)
    val mmrIds = mmr.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val plain = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mmrIds === plain,
      "lambda = 1 must select exactly the relevance top-k")
    val ranks = mmr.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(ranks.values.forall(_ == Seq(1, 2, 3, 4, 5)))
    assert(Retrieval.mmrViolations(corpus, queries,
      candidates = 10, k = 5, lambda = 0.5).isEmpty)
  }

  test("mmrTopK diversifies: a near-duplicate of the top hit is demoted " +
      "at low lambda but kept at lambda=1") {
    def v(seed: Int): Seq[Float] =
      (0 until 64).map(i => math.sin(seed * 64 + i).toFloat)
    def mix(a: Seq[Float], b: Seq[Float], wa: Double): Seq[Float] =
      a.zip(b).map { case (x, y) => (x * wa + y * (1 - wa)).toFloat }
    val q = v(1)
    // 100: very close to q; 101: a near-duplicate of 100; 102: a bit less
    // relevant but from a different direction
    val corpus = Seq(
      (100L, mix(q, v(2), 0.95)),
      (101L, mix(q, v(2), 0.94)),
      (102L, mix(q, v(3), 0.80))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, q)).toDF("vec_id", "embedding")
    def picks(lambda: Double) = Retrieval.mmrTopK(corpus, queries,
        candidates = 3, k = 2, lambda)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(picks(1.0) === Seq(100L, 101L),
      "pure relevance keeps the near-duplicate pair")
    assert(picks(0.3) === Seq(100L, 102L),
      "diversity-weighted selection must swap the near-duplicate for the " +
        "distinct direction")
  }

  test("mmrTopK fold trajectory equals the sim_mmr_exact join cascade " +
      "(two independent formulations of one greedy contract)") {
    // at lambda = 1/2 the fold's 6dp-rounded score argmax provably equals
    // the cascade's integer rel4 − maxsim4 argmax: 4dp-scaled cosines make
    // adjacent objective values 5e-5 apart, far above the 1e-6 rounding
    // step, so 6dp rounding can never merge distinct objectives — same
    // winners, same ties (min id), same trajectory
    val sf = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 32)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 20)
    val fold = Retrieval.mmrTopK(corpus, queries,
        candidates = 10, k = 5, lambda = 0.5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val cascade = graft.Registry.all.find(_.name == "sim_mmr_exact").get
      .fn(spark, sf)
      .select(col("query_id"), col("sel_round").as("rank"), col("neighbor_id"))
    assert(rowSet(fold) === rowSet(cascade))
  }
}
