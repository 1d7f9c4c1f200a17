package graft

import graft.warehouse.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "v", "x")

  test("matched keys take the update's values; unmatched rows carry over") {
    val updates = Seq((2L, "B", 200.0)).toDF("k", "v", "x")
    val got = rowSet(Merge.upsert(target, updates, Seq("k")))
    assert(got == Seq("[1,a,10.0]", "[2,B,200.0]", "[3,c,30.0]"))
  }

  test("unmatched update keys insert") {
    val updates = Seq((4L, "d", 40.0)).toDF("k", "v", "x")
    val got = rowSet(Merge.upsert(target, updates, Seq("k")))
    assert(got.length == 4 && got.contains("[4,d,40.0]"))
  }

  test("empty updates leave the target unchanged") {
    val updates = target.limit(0)
    assert(rowSet(Merge.upsert(target, updates, Seq("k"))) == rowSet(target))
  }

  test("composite keys match on all columns") {
    val t2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val updates = Seq((1L, "y", 99.0)).toDF("k1", "k2", "v")
    val got = rowSet(Merge.upsert(t2, updates, Seq("k1", "k2")))
    assert(got == Seq("[1,x,1.0]", "[1,y,99.0]"))
  }
}
