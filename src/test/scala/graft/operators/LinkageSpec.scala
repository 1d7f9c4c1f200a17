package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "car"), (2L, "cat"), (3L, "caz"), (5L, "cxxxx"), // block "c"
    (4L, "dog") // block "d": never compared against block "c"
  ).toDF("id", "key")

  private def run(window: Int, maxDist: Int) =
    Linkage.sortedNeighborhood(recs, col("id"), col("key"),
      substring(col("key"), 1, 1), window, maxDist)
      .select("id_a", "id_b", "dist")

  test("window=1: only sort-adjacent pairs are examined") {
    // sort order in block c: car(1) < cat(2) < caz(3) < cxxxx(5); (1,3) has
    // dist 1 but sits 2 apart — the window contract excludes it
    assert(rowSet(run(window = 1, maxDist = 2)) ==
      Seq("[1,2,1]", "[2,3,1]"))
  }

  test("window=2: the skipped neighbor appears; distance refine still cuts") {
    // (2,5) and (3,5) enter the neighborhood but fail maxDist=2
    // (lev(cat|caz, cxxxx) = 4); dog never pairs across the block boundary
    assert(rowSet(run(window = 2, maxDist = 2)) ==
      Seq("[1,2,1]", "[1,3,1]", "[2,3,1]"))
  }

  test("distance bound admits the far pairs when raised") {
    assert(rowSet(run(window = 3, maxDist = 4)) ==
      Seq("[1,2,1]", "[1,3,1]", "[1,5,4]", "[2,3,1]", "[2,5,4]", "[3,5,4]"))
  }

  test("multi-pass recovers cross-block matches and measures the recall step") {
    // "blue rod" vs "bxue rod": one typo in the FIRST word puts them in
    // different pass-1 blocks (b-l vs b-x split by first word) — invisible
    // to the single pass — while pass 2 (block = last word, sort =
    // reversed key) co-blocks them under "rod"
    val names = Seq(
      (1L, "blue rod"), (2L, "bxue rod"), // pass-2-only pair (dist 1)
      (3L, "cold bolt"), (4L, "cold bolz"), // same first word: pass 1 finds
      (5L, "green cap"))
      .toDF("id", "key")
    val passes = Seq(
      (split_part(col("key"), lit(" "), lit(1)), col("key")),
      (split_part(col("key"), lit(" "), lit(-1)), reverse(col("key"))))
    val single = Linkage.sortedNeighborhood(names, col("id"), col("key"),
        split_part(col("key"), lit(" "), lit(1)), window = 4, maxDist = 2)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val multi = Linkage.sortedNeighborhoodMultiPass(names, col("id"),
      passes, window = 4, maxDist = 2)
    // all-pairs ground truth at the same distance bound
    val truth = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.key"), col("b.key")) <= 2)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def recall(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs.join(truth, Seq("id_a", "id_b"), "left_semi").count().toDouble /
        truth.count()
    assert(recall(single) === 0.5) // misses (1,2) — wrong pass-1 block
    assert(recall(multi) === 1.0) // the rotated pass recovers it
    assert(rowSet(multi) == Seq("[1,2,1]", "[3,4,1]"))
    // and multi-pass is a superset of the single pass
    assert(single.join(multi, Seq("id_a", "id_b"), "left_anti").isEmpty)
  }
}
