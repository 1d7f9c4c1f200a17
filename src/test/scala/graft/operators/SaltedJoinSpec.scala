package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join, including skewed keys") {
    // key 1 is hot: 100 of 103 rows
    val skewed = ((1 to 100).map(i => (1L, s"row$i")) ++
      Seq((2L, "a"), (3L, "b"), (99L, "no-match"))).toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "unused"))
      .toDF("k", "name")
    val got = rowSet(SaltedJoin.inner(skewed, dim, "k").select("k", "payload", "name"))
    val want = rowSet(skewed.join(dim, Seq("k")).select("k", "payload", "name"))
    assert(got == want && got.length == 102)
  }
}
