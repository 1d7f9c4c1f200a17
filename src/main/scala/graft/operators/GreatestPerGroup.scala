package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greatest-per-group with ALL-TIES-SURVIVE semantics — the reference's Q5
  * derived-table join (reference: /root/reference/app.py:517–526; SURVEY §2
  * row J1).
  */
object GreatestPerGroup {

  /** Literal translation: aggregate side joined back on (group, value).
    * The agg side is |groups| rows — tiny relative to the fact table — so it
    * is broadcast: the fact table is never shuffled. Preferred at scale when
    * the group count fits a broadcast (≲ 100M groups it does not; use
    * [[viaWindow]]). */
  def viaJoin(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // the agg side's group key is renamed so the self-join condition binds
    // two distinct attributes (no ambiguous/trivially-true resolution)
    val maxes = df.groupBy(col(groupCol)).agg(max(col(valueCol)).as("__max_val"))
      .withColumnRenamed(groupCol, "__grp_key")
    df.join(broadcast(maxes),
        col(groupCol) === col("__grp_key") && col(valueCol) === col("__max_val"))
      .drop("__grp_key", "__max_val")
  }

  /** Window formulation: one shuffle of the fact table by the group key, no
    * second scan, no broadcast requirement — the right shape when groups are
    * high-cardinality. */
  def viaWindow(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
    df.withColumn("__max_val", max(col(valueCol)).over(w))
      .filter(col(valueCol) === col("__max_val"))
      .drop("__max_val")
  }
}
