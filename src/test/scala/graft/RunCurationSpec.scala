package graft

import org.apache.spark.sql.functions._

/** The curation composition, stage by stage on a handcrafted corpus where
  * each document exists to be dropped by exactly one stage (or to
  * survive). */
class RunCurationSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while data systems process many queries fast and tables group rows"

  test("each stage drops its target document; clean unique docs survive") {
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val docs = Seq(
      100L -> good,                                  // survives everything
      101L -> good,                                  // exact duplicate of 100
      102L -> good.replace("quick", "quickest"),     // near-dup of 100
      103L -> "too short here now",                  // fails the length gate
      // shares the 3 trigrams of "alpha beta gamma delta epsilon" with eval
      104L -> "the alpha beta gamma delta epsilon and the filler words continue to flow here",
      105L -> "many columns store values and the scan reads rows quickly during every query run"
    ).toDF("doc_id", "text")
    val kept = RunCuration.curate(docs, eval, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(100L, 105L))
  }

  test("compose caps each source longest-first and mixture-samples the cap's output") {
    val corpus = Seq(
      (1L, "a " * 50, "web"), (2L, "b " * 40, "web"), (3L, "c " * 30, "web"),
      (4L, "d " * 20, "wiki"), (5L, "e " * 10, "wiki")
    ).toDF("doc_id", "text", "source")
    // quota 2: web keeps its two longest (1, 2); wiki keeps both
    val capped = RunCuration.compose(corpus, quotaPerSource = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(capped === Seq(1L, 2L, 4L, 5L))
    // with a mixture, non-target sources are dropped and target ones sampled
    val mixed = RunCuration.compose(corpus, quotaPerSource = 2,
      mixture = Some(Seq("web" -> 1.0)))
      .select("source").distinct().as[String].collect().toSeq
    assert(mixed === Seq("web"))
  }

  test("run collapse rewrites text in place before dedup") {
    val eval = Seq((1L, "zzz yyy xxx")).toDF("doc_id", "text")
    // identical AFTER collapsing the doubled token: exact dedup must fire
    val docs = Seq(
      200L -> good,
      201L -> good.replace("quick", "quick quick")
    ).toDF("doc_id", "text")
    val kept = RunCuration.curate(docs, eval, jaccardThreshold = 0.99)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(200L))
  }
}
