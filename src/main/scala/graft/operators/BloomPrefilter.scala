package graft.operators

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter prefiltered semi-join: the runtime-filter pattern for the
  * key-set sizes BETWEEN "broadcast the hash relation" and "shuffle both
  * sides". A semi-join of a 100 TB fact side against, say, 10⁸ filter keys
  * can't broadcast the keys as a join relation (tens of GB of hash table),
  * so Spark would shuffle the ENTIRE fact side by key. A Bloom filter over
  * the same keys is ~1.2 GB at 1% fpp — broadcastable — and `might_contain`
  * is a row-local scan-side predicate, so only rows that (probably) match
  * ever reach the join. Because a Bloom filter has NO false negatives, a
  * final exact join on the survivors returns exactly the plain semi-join
  * result; the fpp only controls how much of the fact side is wastefully
  * shuffled, never correctness.
  *
  * Built from Spark's own runtime-filter machinery ([[BloomFilterAggregate]]
  * / [[BloomFilterMightContain]], the expressions `InjectRuntimeFilter`
  * plants under AQE) wired explicitly: the aggregate runs as a scalar
  * subquery (one pass over the key side, mergeable partial sketches), and
  * the predicate hashes with the same `xxhash64` family the aggregate used.
  * Doing it explicitly rather than relying on `InjectRuntimeFilter` keeps
  * the prefilter present at ANY plan shape (the optimizer rule only fires
  * on selective shuffle-join patterns it can prove).
  */
object BloomPrefilter {

  /** `might_contain(bloom_filter_agg(xxhash64(keys.keyCol)), xxhash64(value))`
    * as a row-local predicate Column. The bloom build is a scalar subquery:
    * computed once (map-side partial sketches, one merge), then shipped to
    * every task like a broadcast variable. `expectedItems`/`fpp` size the
    * sketch via the standard optimal-bits formula. */
  def mightContain(keys: DataFrame, keyCol: String, value: Column,
      expectedItems: Long, fpp: Double = 0.01): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps numBits to this conf (default
    // 67108864 ≈ 8 MB): a 10⁸-key build would degrade to fpp ≈ 1 with no
    // warning — still correct through the refine, but the prefilter stops
    // pruning. Fail loud and tell the caller which knob to raise.
    val maxBits = keys.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(numBits <= maxBits,
      s"bloom needs $numBits bits for $expectedItems items at fpp=$fpp but " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$maxBits would " +
        "silently clamp it (degrading the prefilter to a no-op); raise the conf")
    // the ITEM count is clamped by a second conf — and the hash-function
    // count derives from the clamped value, so an over-limit build would
    // saturate (~fpp 1) even after raising maxNumBits
    val maxItems = keys.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    require(expectedItems <= maxItems,
      s"expectedItems=$expectedItems exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems, which " +
        "BloomFilterAggregate silently clamps (mis-sizing the hash count and " +
        "saturating the filter); raise the conf")
    val keyHash = XxHash64(Seq(GraftBridge.expression(keys(keyCol))), 42L)
    val bloomDf = keys.select(GraftBridge.column(
      new BloomFilterAggregate(keyHash, Literal(expectedItems), Literal(numBits))
        .toAggregateExpression()).as("bloom"))
    val sub = ScalarSubquery(GraftBridge.logicalPlan(bloomDf))
    GraftBridge.column(BloomFilterMightContain(
      sub, XxHash64(Seq(GraftBridge.expression(value)), 42L)))
  }

  /** Exact semi-join of `big` against `keys.keyCol`, Bloom-prefiltered:
    * result rows are IDENTICAL to `big.join(keys, big(col)===keys(keyCol),
    * "left_semi")` — the prefilter only thins what reaches the exact join. */
  def semiJoin(big: DataFrame, bigKey: String, keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // xxhash64 is TYPE-sensitive: int 7 and bigint 7 hash differently, so a
    // type mismatch between the probe and build sides would yield bloom
    // false NEGATIVES — silently dropping matching rows and breaking the
    // "identical to plain left_semi" contract. Fail loud like the
    // maxNumBits/maxNumItems guards rather than return wrong rows.
    val bigType = big.schema(bigKey).dataType
    val keyType = keys.schema(keyCol).dataType
    require(bigType == keyType,
      s"bloom prefilter key types must match exactly (xxhash64 is " +
        s"type-sensitive): $bigKey is $bigType but $keyCol is $keyType — " +
        "cast one side before calling semiJoin")
    val prefiltered = big.filter(
      mightContain(keys, keyCol, big(bigKey), expectedItems, fpp))
    prefiltered.join(keys.select(keys(keyCol).as(bigKey)).distinct(),
      Seq(bigKey), "left_semi")
      .select(big.columns.map(col).toIndexedSeq: _*) // using-join moves the key first; restore
  }
}
