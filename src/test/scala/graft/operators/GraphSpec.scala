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

  test("triangleCounts: self-loops are dropped") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("u", "v")
    assert(rowSet(Graph.triangleCounts(edges)) ==
      Seq("[1,1]", "[2,1]", "[3,1]"))
  }
}
