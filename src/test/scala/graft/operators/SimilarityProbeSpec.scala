package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Multi-probe LSH: probing Hamming-adjacent buckets must only ADD
  * candidates (supersets of single-probe results) and can only move recall
  * toward brute-force ground truth.
  */
class SimilarityProbeSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private val planes = Seq(0, 1, 2, 3)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe candidates are a superset of single-probe; recall never drops") {
    val corpus = emb.filter(col("vec_id") >= 32)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 32)

    val single = pairs(Similarity.lshBucketTopK(corpus, queries, planes, k = 3))
    val multi = pairs(Similarity.lshBucketTopK(corpus, queries, planes, k = 3, probes = 5))
    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, k = 3)
      .filter(col("query_id") >= 16 && col("query_id") < 32))

    def recall(got: Set[(Long, Long)]) =
      got.intersect(truth).size.toDouble / truth.size
    assert(recall(multi) >= recall(single))
    assert(multi.nonEmpty && single.nonEmpty)
  }

  test("IVF: recall vs brute force is monotone in nprobe; probing all clusters = exact") {
    val corpus = emb.filter(col("vec_id") >= 32)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 32)
    val centroids = emb.filter(col("vec_id") < 8)

    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, k = 3))
    def recall(p: Int): Double = {
      val got = pairs(Similarity.ivfTopK(corpus, queries, centroids, k = 3, probes = p))
      got.intersect(truth).size.toDouble / truth.size
    }

    val recalls = Seq(1, 2, 4, 8).map(recall)
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => hi >= lo },
      s"recall not monotone in nprobe: $recalls")
    assert(recalls.head > 0.0)
    // probing every cluster searches the whole corpus — exact by construction
    assert(recalls.last == 1.0, s"nprobe = k-clusters should be exact: $recalls")
  }

  test("ivfTopKByProbe: every probes=p slice is row-identical to ivfTopK(probes=p)") {
    // the sweep primitive's whole contract (and sim_probe_recall's premise):
    // one maxProbes-wide candidate generation, sliced by probe count, must
    // reproduce each standalone search bit for bit — ranks, ties, sims
    val corpus = emb.filter(col("vec_id") >= 32)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 32)
    val centroids = emb.filter(col("vec_id") < 8)
    val sweep = Similarity
      .ivfTopKByProbe(corpus, queries, centroids, k = 3, maxProbes = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    for (p <- 1 to 4) {
      val direct = Similarity
        .ivfTopK(corpus, queries, centroids, k = 3, probes = p)
        .collect()
        .map(r => (p.toLong, r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val slice = sweep.filter(_._1 == p.toLong)
      assert(slice == direct, s"probe sweep slice p=$p diverges from ivfTopK")
    }
  }

  test("range search: exactly the scored pairs at or above the threshold") {
    val corpus = emb.filter(col("vec_id") >= 32)
    val queries = emb.filter(col("vec_id") >= 16 && col("vec_id") < 32)

    // every returned row clears the threshold, and the result is exactly
    // the ≥-τ slice of the brute-force scored set: a generous top-k per
    // query bounds the same scored pairs from above, so filtering IT at τ
    // must reproduce range search (k exceeds any neighborhood size here)
    val got = Similarity.rangeSearch(corpus, queries, minSim = 0.25)
    assert(got.filter(col("sim") < 0.25).isEmpty)
    val viaTopK = Similarity.bruteForceTopK(corpus, queries, k = 1000)
      .filter(col("sim") >= 0.25)
    assert(pairs(got) == pairs(viaTopK))
    assert(pairs(got).nonEmpty)

    // tightening the threshold only removes rows (monotone contraction)
    val tighter = pairs(Similarity.rangeSearch(corpus, queries, minSim = 0.3))
    assert(tighter.subsetOf(pairs(got)))
  }
}
