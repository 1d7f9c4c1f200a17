package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed GLOBAL ranking — the production form of the single-partition
  * `Window.orderBy(value)` that several judged entries use at fixture scale
  * (dq_mannwhitney's pooled midranks, the ev_rfm/tx_ppl_buckets ntiles).
  * An unpartitioned window funnels the whole frame through ONE task; fine
  * to ~10⁸ rows, a wall at 100 TB. The classic two-phase rewrite:
  *
  *   1. range-repartition by the value — each partition owns a contiguous
  *      value interval, and equal values are CO-LOCATED (the range
  *      partitioner assigns a key to exactly one partition);
  *   2. per-partition row counts (one tiny P-row aggregate) prefix-sum into
  *      broadcast offsets;
  *   3. within-partition rank/tie-count windows (every partition
  *      independent — full cluster width), shifted by the partition's
  *      offset.
  *
  * `global min_rank = offset(partition) + local min_rank`, exactly — ties
  * never straddle a partition boundary, so tie counts are local too.
  *
  * Determinism: the range boundaries come from the partitioner's sampling
  * of a deterministic input, and every rank value produced is a pure
  * function of the VALUE (min-rank and tie count don't depend on row order
  * within a tie). RanksSpec asserts bit-equality with the global-window
  * form on the judged fixture, row for row, and equality of the full
  * Mann–Whitney statistic chain built on top.
  *
  * Skew note: one pathologically dominant tie group still lands in one
  * partition (ranking ties are not saltable — their rank is shared). The
  * quantile-sketch bucketing (tx_length_quantiles' LogHistogram) is the
  * rewrite when per-VALUE mass exceeds a partition.
  */
object Ranks {

  /** Append `r2Col` = 2·min_rank + (tie_count − 1) over the GLOBAL order
    * of `valueCol` — twice the statistical midrank, kept integer so no .5
    * rational ever materializes (the dq_mannwhitney contract) — without a
    * single-partition window. `parts` defaults to the session shuffle
    * width. Nulls must be pre-filtered (a global order over nulls is not
    * part of the contract). */
  def globalMidranks2x(df: DataFrame, valueCol: String,
      r2Col: String = "r2", parts: Int = 0): DataFrame = {
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // checkpoint the ranged frame: BOTH consumers (the count aggregate and
    // the ranked output) must observe ONE materialization, so the sampled
    // range boundaries — and therefore every partition id — are pinned
    val ranged = graft.plans.LazyCheckpoint.of(
      df.repartitionByRange(p, col(valueCol))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // P rows: the prefix-sum window is single-partition but bounded by
    // the partition COUNT, not the data
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy("__pid").orderBy(valueCol)
    val tieW = Window.partitionBy("__pid", valueCol)
    ranged
      .withColumn("__lr", rank().over(localW).cast("long"))
      .withColumn("__t", count(lit(1)).over(tieW))
      .join(broadcast(offsets), "__pid")
      .withColumn(r2Col,
        lit(2L) * (col("__off") + col("__lr")) + col("__t") - lit(1L))
      .drop("__pid", "__lr", "__t", "__off")
  }

  /** n-tile over a STRICT global order — the production form of
    * `ntile(n).over(Window.orderBy(...))` (ev_rfm, tx_ppl_buckets'
    * per-language form): `orderCols` MUST be a total order (include a
    * unique tiebreak column, as every judged ntile here does), which makes
    * the bucket a closed-form function of the global row number r —
    * SQL ntile gives the first N mod n buckets ⌈N/n⌉ rows and the rest
    * ⌊N/n⌋ — so the same two-phase machinery (range repartition on the
    * FULL order key, broadcast offsets, per-partition row_number) replaces
    * the single-partition window; the bucket arithmetic is exact integer
    * division. RanksSpec pins bit-equality against the window form,
    * including the N < n and non-divisible-N edge layouts. */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], n: Int,
      outCol: String, parts: Int = 0): DataFrame = {
    require(n >= 1, s"ntile buckets must be >= 1, got $n")
    require(orderCols.nonEmpty, "orderCols must be a (total) order")
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = graft.plans.LazyCheckpoint.of(
      df.repartitionByRange(p, orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val allW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(allW))
      .select(col("__pid"), col("__off"), col("__n"))
    val localW = Window.partitionBy("__pid").orderBy(orderCols: _*)
    ranged
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("__r", col("__off") + col("__lr")) // global row number
      .withColumn("__q", expr(s"__n div ${n.toLong}"))
      .withColumn("__rem", col("__n") % lit(n.toLong))
      // SQL ntile: ranks 1..rem·(q+1) fill the first rem buckets (q+1
      // rows each), the rest fill buckets of q rows. Exact integer ceils:
      // ceil(a/b) = (a + b − 1) div b; q = 0 only when N < n, where the
      // first branch covers every rank (rem = N), so the greatest() guard
      // in the dead branch only keeps ANSI division happy.
      .withColumn(outCol, when(
        col("__r") <= col("__rem") * (col("__q") + lit(1L)),
        expr("(__r + __q) div (__q + 1)"))
        .otherwise(expr(
          "__rem + (__r - __rem * (__q + 1) + greatest(__q, 1) - 1) " +
            "div greatest(__q, 1)")))
      .drop("__pid", "__lr", "__off", "__n", "__q", "__rem", "__r")
  }

  /** Per-KEY n-tile over a strict per-key order — the production form of
    * `ntile(n).over(Window.partitionBy(keys).orderBy(...))` when one key's
    * population exceeds a task (tx_ppl_buckets' per-language terciles with
    * a dominant language): range-repartition on (keys ++ order) so each
    * key's rows are CONTIGUOUS across partitions, per-(partition, key)
    * counts prefix-sum into per-key offsets (a keys×P-row frame — windows
    * over it are bounded by partition count, not data), per-(partition,
    * key) row_number at full width, then the same closed-form bucket. */
  def ntilePerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      n: Int, outCol: String, parts: Int = 0): DataFrame = {
    require(n >= 1 && keyCols.nonEmpty && orderCols.nonEmpty)
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val keys = keyCols.map(col)
    val ranged = graft.plans.LazyCheckpoint.of(
      df.repartitionByRange(p, keys ++ orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.partitionBy(keys: _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val allW = Window.partitionBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged.groupBy(keys :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(allW))
      .select(keys :+ col("__pid") :+ col("__off") :+ col("__n"): _*)
    val localW = Window.partitionBy(keys :+ col("__pid"): _*)
      .orderBy(orderCols: _*)
    ranged
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn("__r", col("__off") + col("__lr"))
      .withColumn("__q", expr(s"__n div ${n.toLong}"))
      .withColumn("__rem", col("__n") % lit(n.toLong))
      .withColumn(outCol, when(
        col("__r") <= col("__rem") * (col("__q") + lit(1L)),
        expr("(__r + __q) div (__q + 1)"))
        .otherwise(expr(
          "__rem + (__r - __rem * (__q + 1) + greatest(__q, 1) - 1) " +
            "div greatest(__q, 1)")))
      .drop("__pid", "__lr", "__off", "__n", "__q", "__rem", "__r")
  }

  /** Per-KEY global row number over a strict per-key order — the
    * production form of
    * `row_number().over(Window.partitionBy(keys).orderBy(...))` when one
    * key's population exceeds a task (the tx_length_gini rank attach):
    * the [[ntilePerKey]] machinery without the bucket arithmetic — range
    * repartition on (keys ++ order) keeps each key's rows contiguous,
    * per-(partition, key) counts prefix-sum into per-key offsets (a
    * keys×P-row frame), local row_number at full cluster width.
    * `orderCols` MUST be a total order within each key. */
  def rowNumberPerKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], outCol: String, parts: Int = 0): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val keys = keyCols.map(col)
    val ranged = graft.plans.LazyCheckpoint.of(
      df.repartitionByRange(p, keys ++ orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.partitionBy(keys: _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(keys :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select(keys :+ col("__pid") :+ col("__off"): _*)
    val localW = Window.partitionBy(keys :+ col("__pid"): _*)
      .orderBy(orderCols: _*)
    ranged
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(outCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }

  /** Mann–Whitney U + tie-corrected z over (arm, y) rows, built on the
    * two-phase ranks — the at-scale form of the judged dq_mannwhitney
    * (which uses a global window for its oracle parity). Output schema and
    * arithmetic chain are IDENTICAL: exact long rank sums, T = Σ(t³−t)
    * exact, one mirrored double chain, rounded once. */
  def mannWhitney(armed: DataFrame, armCol: Column, yCol: Column): DataFrame = {
    val byArm = armed.select(armCol.as("arm"), yCol.as("y"))
    val ranked = globalMidranks2x(byArm, "y")
    val ties = byArm.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
    val stats = ranked.groupBy().agg(
      sum(when(col("arm") === "A", col("r2")).otherwise(lit(0L))).as("r2a"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
    val uA = (col("r2a") - col("n_a") * (col("n_a") + lit(1L)))
      .cast("double") / lit(2.0)
    val mu = (col("n_a") * col("n_b")).cast("double") / lit(2.0)
    val nn = (col("n_a") + col("n_b")).cast("double")
    val varU = ((col("n_a") * col("n_b")).cast("double") / lit(12.0)) *
      ((nn + lit(1.0)) - col("tt").cast("double") /
        ((col("n_a") + col("n_b")) *
         (col("n_a") + col("n_b") - lit(1L))).cast("double"))
    stats.crossJoin(broadcast(ties))
      .select(col("n_a"), col("n_b"), uA.as("u_a"),
        round((uA - mu) / sqrt(varU), 6).as("z"))
  }
}
