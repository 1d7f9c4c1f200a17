package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting: the skewed (large) side gets a random
  * salt in [0, salts); the small-but-too-big-to-broadcast side is replicated
  * `salts` times; the join key becomes (key, salt), spreading each hot key
  * over `salts` reducers.
  *
  * This is the manual fallback for when AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our sessions)
  * can't help — e.g. a skewed key feeding a subsequent aggregation, or a
  * deliberately pre-partitioned layout. Result is identical to
  * `skewed.join(other, keys)` (inner).
  */
object SaltedJoin {

  def inner(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    // deterministic salt (hash of all columns) rather than rand(): keeps
    // the operator reproducible and retry-safe (a failed task re-derives
    // identical salt assignments)
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salts)))
    val replicated = other
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
