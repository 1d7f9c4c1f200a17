package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("train: frequency order with lexicographic tiebreak, overlaps counted") {
    // word dict: "aa" x2 -> (a,a):2 each = 4 with... no: "aa" has ONE (a,a)
    // pair per occurrence. "aaa" x1 -> (a,a) twice (overlap). "ab" x3.
    val docs = Seq("aa aa aaa", "ab ab ab").toDF("text")
    val rules = BpeTrainer.train(docs, col("text"), 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts round 0: (a,a) = 2 (from aa x2) + 2 (overlap in aaa) = 4 > (a,b) = 3
    assert(rules(0) === ((0, "a", "a", 4L)))
    // round 1: aa->[aa], aaa->[aa,a] so (aa,a)=1; ab->[a,b] so (a,b)=3
    assert(rules(1) === ((1, "a", "b", 3L)))
    // round 2: remaining pairs: (aa,a)=1 only
    assert(rules(2) === ((2, "aa", "a", 1L)))
  }

  test("train: tie on count breaks to the lexicographically smallest pair") {
    val docs = Seq("xy cd xy cd").toDF("text")
    val first = BpeTrainer.train(docs, col("text"), 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(first === (("c", "d")))
  }

  test("train: exhausted dict stops emitting rules and keeps state intact") {
    val docs = Seq("ab ab").toDF("text")
    val rules = BpeTrainer.train(docs, col("text"), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // one merge fuses everything; rounds 1..4 find no pairs -> no rows
    assert(rules.toSeq === Seq((0, "a", "b")))
  }

  test("segmentText applies rules in rank order, left-to-right non-overlapping") {
    val rules = Seq(("a", "a"), ("a", "b"))
    val got = Seq("aab aa bb aaa")
      .toDF("t")
      .select(BpeTrainer.segmentText(col("t"), rules).as("s"))
      .as[Seq[String]].head()
    // aab: [a,a,b] -(a,a)-> [aa,b] -(a,b)-> no (a,b) adjacency -> [aa,b]
    // aa:  [aa]; bb: [b,b]; aaa: [a,a,a] -> [aa,a] (left-to-right, no re-merge)
    assert(got === Seq("aa", "b", "aa", "b", "b", "aa", "a"))
  }

  test("contractViolations: empty on trained tables, flags each broken invariant") {
    val docs = Seq("low low low lower lower", "aa ab aa").toDF("text")
    val trained = BpeTrainer.train(docs, col("text"), 4)
    assert(BpeTrainer.contractViolations(trained).count() === 0L)

    // rank-1 count above rank-0 -> nonincreasing; rank-2 uses a multi-char
    // left symbol no earlier rule built -> uncomposable_a (note "lo" IS
    // composable: rule 0 built it; "xy" is not)
    val bad = Seq(
      (0, "l", "o", 5L),
      (1, "o", "w", 9L),
      (2, "xy", "z", 1L),
      (3, "lo", "w", 1L)).toDF("rank", "a", "b", "cnt")
    val kinds = BpeTrainer.contractViolations(bad)
      .select("kind", "rank").as[(String, Int)].collect().toSet
    assert(kinds === Set(("nonincreasing", 1), ("uncomposable_a", 2)))
  }

  test("trained rules round-trip through the segmenter") {
    val docs = Seq("low low low lower lower").toDF("text")
    val trained = BpeTrainer.train(docs, col("text"), 3)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // "low" x3, "lower" x2: (l,o)=5, (o,w)=5 -> tiebreak (l,o) first,
    // then [lo,w]: (lo,w)=5, (w,e)=2, (e,r)=2 -> (lo,w), then (e,r)... wait
    // after [low]: lower=[low,e,r]: pairs (low,e)=2,(e,r)=2 -> (e,r)
    assert(trained === Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    val seg = Seq("lowest lower")
      .toDF("t")
      .select(BpeTrainer.segmentText(col("t"), trained).as("s"))
      .as[Seq[String]].head()
    // lowest: [l,o,w,e,s,t] -> [low,e,s,t] ((e,r) never adjacent)
    // lower:  [l,o,w,e,r] -> [low,e,r] -> [low,er]
    assert(seg === Seq("low", "e", "s", "t", "low", "er"))
  }
}
