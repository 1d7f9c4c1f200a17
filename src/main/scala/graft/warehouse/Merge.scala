package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** MERGE/upsert for the warehouse zone (the maintenance operation the
  * reference approximates with duplicate-PK-swallowing inserts,
  * /root/reference/app.py:392–394 — here as an explicit set operation).
  *
  * `upsert` = matched rows take the update's values, unmatched update rows
  * insert, everything else carries over: one left-anti join + unionByName.
  * Scale: both sides shuffle once on the key (zero times if target and
  * updates are bucketed on it — sources/Bucketed); the update side is
  * typically small and broadcasts.
  */
object Merge {

  /** PRECONDITION: `updates` carries at most one row per key — SQL MERGE's
    * "multiple source rows matched" case is the caller's to resolve (e.g.
    * `GreatestPerGroup`/`TopKPerGroup` to pick a winner, or
    * `dropDuplicates(keys)`) BEFORE the upsert; with duplicate update keys
    * this emits duplicate key rows, exactly like a blind append would. Not
    * checked here: verifying it costs a full aggregate over the updates,
    * which callers batching small updates shouldn't pay per call. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }
}
