package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the versioned-dimension
  * maintenance operation next to [[Merge.upsert]] (which is type-1:
  * overwrite, history lost). A type-2 dimension keeps every historical
  * attribute state as its own row with a `[valid_from, valid_to)`
  * interval, `valid_to IS NULL` marking each key's open version — the
  * shape every as-of join (aj_asof_join) and point-in-time feature
  * lookup downstream expects.
  *
  * Semantics per key, for a batch of timestamped updates:
  *   - an update whose attributes equal the effective prior state is a
  *     NO-OP (idempotent replay: re-merging the same batch changes
  *     nothing);
  *   - a changed update CLOSES the previous open version at its
  *     timestamp and opens a new one from it;
  *   - several changes in one batch chain — each intermediate version
  *     materializes with its own interval;
  *   - an unknown key inserts its first open version;
  *   - a STALE update (timestamp not after the open version's
  *     valid_from) is dropped by declared rule — intervals never go
  *     backwards.
  *
  * Purely functional: returns the merged table; callers persist through
  * [[AtomicCommit]] like every other warehouse write.
  *
  * Scale shape: ONE key-partitioned window pass over the (small) update
  * batch, one keyed join against the open slice of the dimension (AQE
  * broadcasts the batch side while small), and a key-grouped min over
  * the change set; the closed history never shuffles — it carries over
  * untouched. With target and updates bucketed on the key
  * (sources/Bucketed) the joins are zero-shuffle.
  */
object Scd2 {

  /** Run-collapse note: an update is kept when its attribute struct
    * differs (null-safe) from the PREVIOUS UPDATE's in timestamp order —
    * seeded with the open version's attributes. Comparing to the
    * previous update (not the previous KEPT update) is equivalent:
    * a dropped update is by definition equal to its predecessor, so
    * equality to it is equality to the last kept state.
    *
    * Equal-timestamp rule: two updates for one key at the SAME ts would
    * make lag/lead order-dependent and lead() would mint a zero-width
    * [t, t) version — so duplicate (key, ts) rows are collapsed FIRST,
    * keeping the row with the greatest attribute struct (a total,
    * run-independent order; exact duplicates collapse to themselves).
    * After the collapse every per-key window order is strict, so the
    * merge is deterministic by construction. */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], ts: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs keys and attrs")
    val open = current.filter(col("valid_to").isNull)
    val closed = current.filter(col("valid_to").isNotNull)
    // tie collapse under the SAME key-only partitioning every later window
    // uses (round 15; was its own (keys, ts)-partitioned window — a whole
    // extra exchange of the batch): within one per-key sort by
    // (ts, attrs desc), the first row of each equal-ts run IS the
    // greatest-attribute row the old row_number kept, and the ordering is
    // a superset of the (ts)-ordering the lag/lead windows below need, so
    // one exchange + one sort serve the collapse and both windows.
    val tieW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), struct(attrs.map(col): _*).desc)
    val updates1 = updates
      .withColumn("graft_prev_ts", lag(col(ts), 1).over(tieW))
      .filter(col("graft_prev_ts").isNull || col("graft_prev_ts") =!= col(ts))
      .drop("graft_prev_ts")

    val openA = open.select(
      (keys.map(col) :+ col("valid_from").as("open_from")) ++
        attrs.map(c => col(c).as(s"cur_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val attrStruct = struct(attrs.map(col): _*)
    // baseline for the first update of a key = the open version's attrs
    // (all-null struct for a brand-new key, which any real first state
    // then differs from)
    val baseline = coalesce(lag(attrStruct, 1).over(w),
      struct(attrs.map(c => col(s"cur_$c").as(c)): _*))
    val changes = updates1
      .join(openA, keys, "left")
      .filter(col("open_from").isNull || col(ts) > col("open_from"))
      .withColumn("graft_keep", !(attrStruct <=> baseline))
      .filter(col("graft_keep"))
      .select((keys.map(col) :+ col(ts)) ++ attrs.map(col): _*)

    val newVersions = changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(keys.map(col) ++ attrs.map(col) :+
        col("valid_from") :+ col("valid_to"): _*)

    val firstChange = changes.groupBy(keys.map(col): _*)
      .agg(min(col(ts)).as("graft_chg_ts"))
    val openOut = open.join(firstChange, keys, "left")
      .withColumn("valid_to", col("graft_chg_ts")) // was null; null stays open
      .drop("graft_chg_ts")

    closed.unionByName(openOut).unionByName(newVersions)
  }
}
