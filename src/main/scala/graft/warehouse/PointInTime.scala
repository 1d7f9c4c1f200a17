package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) lookup against a type-2 dimension — the read side
  * [[Scd2]] exists for: each probe row (key, event time) gets the
  * dimension attributes of the version VALID AT that instant, i.e. the
  * version with the greatest `valid_from <= ts`. Because SCD2 intervals
  * tile per key (each close equals the next open — Scd2Spec pins it),
  * "latest version starting at or before ts" IS the containing version,
  * so no `valid_to` check and no range join are needed.
  *
  * Shape: the aj_asof_join union trick — dimension versions and probes
  * union into ONE key-partitioned frame ordered by (t, dim-first), and a
  * running `last(attrs, ignoreNulls)` carries each version forward to
  * every probe after it. A probe before the key's first version (or on an
  * unknown key) reports NULL attributes. One user-keyed window, no
  * inequality join — the 100 TB as-of shape. A version opening exactly AT
  * a probe's ts applies to it (`[valid_from, valid_to)` is closed on the
  * left; the dim-first tiebreak encodes it).
  *
  * The attributes ride in ONE struct so a legitimately-NULL attribute
  * inside a version does not fall through to an older version (a bare
  * per-column `last(ignoreNulls)` would).
  */
object PointInTime {

  /** `probes` plus `attrs` as-of columns. `dim` must carry `keys`,
    * `valid_from`, and `attrs`; `probes` must carry `keys` and `ts` and
    * must not already have columns named like `attrs`. */
  def lookup(dim: DataFrame, probes: DataFrame, keys: Seq[String],
      ts: String, attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "pit lookup needs keys and attrs")
    require(attrs.forall(a => !probes.columns.contains(a)),
      s"probes already carry attr column(s): ${attrs.filter(probes.columns.contains)}")
    val probeCols = probes.columns.toSeq
    val attrStruct = struct(attrs.map(col): _*)
    val dimSide = dim.select(
      keys.map(col) ++
        Seq(col("valid_from").as("__t"), lit(1).as("__is_dim"),
          attrStruct.as("__attrs")) ++
        probeCols.filterNot(keys.contains).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val probeSide = probes.select(
      keys.map(col) ++
        Seq(col(ts).as("__t"), lit(0).as("__is_dim"),
          lit(null).cast(dimSide.schema("__attrs").dataType).as("__attrs")) ++
        probeCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimSide.unionByName(probeSide)
      .withColumn("__asof", last(col("__attrs"), ignoreNulls = true).over(w))
      .filter(col("__is_dim") === 0)
      .select(probeCols.map(col) ++
        attrs.map(a => col(s"__asof.$a").as(a)): _*)
  }
}
