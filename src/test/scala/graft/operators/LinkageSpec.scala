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
}
