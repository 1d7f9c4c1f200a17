package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: K4 + path + star, duplicate/reversed edges collapse") {
    val edges = Seq(
      // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed duplicates: must not change counts
      // path 5-6-7: wedges but no triangle
      (5L, 6L), (6L, 7L),
      // star at 8: hub wedges, no closures
      (8L, 9L), (8L, 10L), (8L, 11L)
    ).toDF("u", "v")
    assert(rowSet(Graph.triangleCounts(edges)) ==
      Seq("[1,3]", "[2,3]", "[3,3]", "[4,3]"))
  }

  test("triangleCounts: two triangles sharing an edge count both") {
    // {1,2,3} and {2,3,4} share edge (2,3): nodes 2,3 sit in 2 triangles
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    assert(rowSet(Graph.triangleCounts(edges)) ==
      Seq("[1,1]", "[2,2]", "[3,2]", "[4,1]"))
  }

  test("kcore: pendant peels off, core survives with in-core degrees") {
    // K4 {1,2,3,4} + pendant 5-1: k=3 drops 5 in round 1, K4 stays
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("u", "v")
    assert(rowSet(Graph.kcore(edges, k = 3, rounds = 3)) ==
      Seq("[1,3]", "[2,3]", "[3,3]", "[4,3]"))
  }

  test("kcore: the round count is the contract — cascades peel one ring per round") {
    // path 10-11-12-13-14 at k=2: endpoints fall each round
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("u", "v")
    // one round: 10 and 14 dropped, middle chain remains with new degrees
    assert(rowSet(Graph.kcore(path, k = 2, rounds = 1)) ==
      Seq("[11,1]", "[12,2]", "[13,1]"))
    // enough rounds: the whole path dissolves (a path has no 2-core)
    assert(rowSet(Graph.kcore(path, k = 2, rounds = 3)) == Seq())
  }

  test("triangleCounts: self-loops are dropped") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("u", "v")
    assert(rowSet(Graph.triangleCounts(edges)) ==
      Seq("[1,1]", "[2,1]", "[3,1]"))
  }
}
