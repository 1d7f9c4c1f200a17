package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // dim=4, m=2: subspace 0 clusters at (0,0) / (10,10); subspace 1 at
  // (5,5) / (-5,-5). Ids 1 and 2 (the k=2 seeds) sit in DIFFERENT clusters
  // of every subspace so Lloyd separates immediately.
  private def v(a: Double, b: Double, c: Double, d: Double) =
    Seq(a.toFloat, b.toFloat, c.toFloat, d.toFloat)
  private lazy val corpus = Seq(
    (1L, v(0, 0, 5, 5)), (2L, v(10, 10, -5, -5)),
    (3L, v(1, 1, 4, 6)), (4L, v(9, 11, -4, -6)),
    (5L, v(-1, 1, 6, 4)), (6L, v(11, 9, -6, -4))
  ).toDF("vec_id", "embedding")

  private lazy val books = ProductQuantizer.train(corpus, m = 2, k = 2, iters = 3, dim = 4)

  test("train recovers the exact per-subspace cluster means") {
    val got = books.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2).toSeq)).toMap
    assert(got((0, 0L)) === Seq(0.0, 2.0 / 3)) // mean of (0,0),(1,1),(-1,1)
    assert(got((0, 1L)) === Seq(10.0, 10.0))   // mean of (10,10),(9,11),(11,9)
    assert(got((1, 0L)) === Seq(5.0, 5.0))     // mean of (5,5),(4,6),(6,4)
    assert(got((1, 1L)) === Seq(-5.0, -5.0))
  }

  test("encode assigns every vector its cluster's code in every subspace") {
    val codes = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(codes(1L) === Seq(0L, 0L) && codes(3L) === Seq(0L, 0L) && codes(5L) === Seq(0L, 0L))
    assert(codes(2L) === Seq(1L, 1L) && codes(4L) === Seq(1L, 1L) && codes(6L) === Seq(1L, 1L))
  }

  test("decode reconstructs the chosen sub-centroid concatenation") {
    val encoded = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
    val approx = ProductQuantizer.decode(encoded, books, m = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(approx(1L) === Seq(0.0, 2.0 / 3, 5.0, 5.0))
    assert(approx(2L) === Seq(10.0, 10.0, -5.0, -5.0))
    // quantization error is bounded by the cluster spread, not the data range
    val raw = Map(3L -> Seq(1.0, 1.0, 4.0, 6.0))
    val err = math.sqrt(approx(3L).zip(raw(3L)).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(err < 2.5, s"reconstruction error $err too large")
  }

  test("adcTopK ranks by L2 to the DECODED vectors, ties break to the smaller id") {
    val encoded = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
    val queries = corpus.filter(col("vec_id") <= 2)
    val got = ProductQuantizer.adcTopK(encoded, queries, books, m = 2, dim = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // q1 = (0,0,5,5): decoded group-A members 3 and 5 are its nearest;
    // q2 = (10,10,-5,-5): decode(4) == decode(6) == q2 exactly (distance 0).
    // The heap emits kept rows unordered; compare the kept SETs.
    assert(got(1L) === Seq(3L, 5L))
    assert(got(2L) === Seq(4L, 6L))
  }

  test("encode/decode plans are pure maps: no exchange over the corpus") {
    val plan = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.split("BroadcastExchange").head.contains("Exchange "),
      s"corpus side of encode must not shuffle:\n$plan")
  }

  test("adcRerankTopK with a corpus-wide shortlist equals exact " +
      "brute-force L2 (ordering + rounding contract)") {
    val encoded = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
    val queries = corpus.filter(col("vec_id") <= 2)
    val rerank = ProductQuantizer.adcRerankTopK(encoded, queries, books,
        corpus, m = 2, dim = 4, shortlist = 6, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.bruteForceTopKL2(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rerank === exact,
      "a shortlist covering the whole corpus must reproduce the exact top-k")
  }

  test("adcRerankTopK results are a subset of the ADC shortlist and " +
      "exact within it") {
    val encoded = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
    val queries = corpus.filter(col("vec_id") <= 2)
    val shortlist = ProductQuantizer.adcTopK(encoded, queries, books,
        m = 2, dim = 4, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerank = ProductQuantizer.adcRerankTopK(encoded, queries, books,
        corpus, m = 2, dim = 4, shortlist = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rerank.forall { case (q, n, _) => shortlist((q, n)) },
      "rerank may only reorder the shortlist, never add candidates")
    // within the shortlist the ordering is the exact L2 contract: every
    // returned distance equals the direct rounded L2 of the raw pair
    val raw = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    rerank.foreach { case (q, n, d) =>
      val exact = math.sqrt(raw(q).zip(raw(n))
        .map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(d - BigDecimal(exact)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"($q,$n): dist $d != exact rounded $exact")
    }
  }

  test("adcRerankTopK never lowers recall vs plain adcTopK at the same k") {
    // recall measured against exact L2 truth on the spec corpus — rerank
    // reorders a superset of what adcTopK returns, by the truth's own
    // metric, so per-query hits can only stay or improve
    val encoded = ProductQuantizer.encode(corpus, books, m = 2, dim = 4)
    val queries = corpus.filter(col("vec_id") <= 2)
    val truth = Similarity.bruteForceTopKL2(corpus, queries, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = ProductQuantizer.adcTopK(encoded, queries, books,
        m = 2, dim = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerank = ProductQuantizer.adcRerankTopK(encoded, queries, books,
        corpus, m = 2, dim = 4, shortlist = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((truth & rerank).size >= (truth & adc).size,
      s"rerank hits ${(truth & rerank).size} < adc hits ${(truth & adc).size}")
  }
}
