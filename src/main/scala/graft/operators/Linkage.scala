package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage operators: find records that refer to the same real-world
  * entity under typos/variants, without the all-pairs comparison that makes
  * naive fuzzy matching quadratic.
  *
  * Reference surface: the reference pipeline has no fuzzy matching (its
  * dedup key is the exact video/channel id), but entity resolution is the
  * first thing a real warehouse bolts onto a YouTube-shaped catalog
  * (channel renames, re-uploads with tweaked titles) and a training-data
  * pipeline needs it for source-level metadata reconciliation — so the
  * engine ships the canonical bounded-comparison method.
  */
object Linkage {

  /** Blocked sorted-neighborhood pair generation with an edit-distance
    * refine — the Hernández & Stolfo (SIGMOD 1995) merge/purge method:
    * records sort by the linkage key WITHIN blocks, and each record is
    * compared against its `window` successors in that order only, so
    * candidate generation is O(n·window) instead of O(n²).
    *
    * Scale shape: the sort is a block-keyed window — NOT the single-pass
    * global sort of the original paper, which is a one-task bottleneck at
    * cluster scale. The block key is the method's first blocking pass
    * (records in different blocks are never compared — the published
    * multi-pass extension re-runs with rotated block/sort keys to recover
    * cross-block matches, and each pass is this same operator). Within a
    * block, `window` lead() columns make neighbor pairing row-local: no
    * self-join, no range join, and the edit-distance refine runs on the
    * O(n·window) candidates only. Skew bound: a block's work is
    * O(block·window), linear in block size, so even a degenerate block
    * costs its sort, never a quadratic pair emission.
    *
    * Output: (id_a, id_b, key_a, key_b, dist) for candidate pairs with
    * levenshtein(key_a, key_b) ≤ `maxDist`, id_a preceding id_b in the
    * (block, key, id) total order. Recall contract: pairs more than
    * `window` apart in sort order (or in different blocks) are not
    * examined — `window` and the pass count are the method's published
    * recall/cost knobs, not hidden approximations. */
  def sortedNeighborhood(recs: DataFrame, idCol: Column, keyCol: Column,
      blockCol: Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = recs.select(idCol.as("id"), keyCol.as("key"),
      blockCol.as("blk"))
    val w = Window.partitionBy("blk").orderBy("key", "id")
    val nbrs = array((1 to window).map(i =>
      struct(lead(col("id"), i).over(w).as("id_b"),
        lead(col("key"), i).over(w).as("key_b"))): _*)
    base
      // window expressions must materialize before the generator consumes
      // them (Catalyst rejects windows inside explode's child)
      .select(col("id").as("id_a"), col("key").as("key_a"), nbrs.as("nbrs"))
      .select(col("id_a"), col("key_a"), explode(col("nbrs")).as("nb"))
      .filter(col("nb.id_b").isNotNull)
      .select(col("id_a"), col("nb.id_b").as("id_b"),
        col("key_a"), col("nb.key_b").as("key_b"),
        levenshtein(col("key_a"), col("nb.key_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** The published MULTI-PASS extension of [[sortedNeighborhood]]
    * (Hernández & Stolfo §4: "no single key will be sufficient to catch
    * all matching records" — re-run with rotated block/sort keys and take
    * the union): each `(blockCol, keyCol)` pass runs the same
    * single-pass operator, pair ids normalize to `id_a < id_b`, and the
    * union dedupes with the MINIMUM distance any pass measured. A pair
    * whose records disagree in one pass's block (a typo in the first
    * word) is recovered by a pass that blocks on a different fragment
    * (the last word) — LinkageSpec measures the recall step per pass
    * against all-pairs ground truth.
    *
    * Scale shape: `passes` sequential runs of the O(n·window) single
    * pass plus ONE pair-keyed dedup aggregate over their (already
    * distance-filtered, near-dup-sparse) union — the pass count
    * multiplies cost linearly, exactly the paper's recall/cost knob. */
  def sortedNeighborhoodMultiPass(recs: DataFrame, idCol: Column,
      passes: Seq[(Column, Column)], window: Int, maxDist: Int): DataFrame = {
    require(passes.nonEmpty, "at least one (block, key) pass required")
    passes.map { case (blk, key) =>
      sortedNeighborhood(recs, idCol, key, blk, window, maxDist)
        .select(
          least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          col("dist"))
    }.reduce(_.unionByName(_))
      .groupBy("id_a", "id_b").agg(min(col("dist")).as("dist"))
  }
}
