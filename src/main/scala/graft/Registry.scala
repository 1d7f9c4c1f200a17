package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: a Spark DataFrame program plus (when SQL-expressible) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same parquet
  * tables. Column names of the Spark result and the oracle SQL must agree —
  * the driver's compare sorts columns by name before hashing values.
  *
  * Determinism contract (SURVEY §7.4): every double that is *derived* (sums,
  * averages, ratios, cosines) is either computed through exact decimal
  * arithmetic and cast to double at the end, or rounded to a fixed scale on
  * both sides; raw column passthroughs are bit-exact by construction.
  */
/** `headline` marks the round-1 bench set (timings comparable across every
  * round); `headline2` marks the second bench tier added in round 12 — the
  * heaviest operator families (similarity joins, graph builds, classifier
  * training) whose wall-clock would otherwise regress invisibly. The tiers
  * are reported separately so tier-1 totals stay round-over-round
  * comparable. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    headline: Boolean = false,
    headline2: Boolean = false)

object Registry {

  /** The tier-2 bench set, assigned HERE (one list, not per-entry flags):
    * the engine's heaviest QUERY-shaped operator families — exact
    * similarity join, cross-doc boilerplate spans, winnowing pair
    * generation, triangle counting. Registered by name so a rename or
    * removal fails loudly below. The model/graph BUILD operators
    * (classifier training, NN-Descent) are benched in [[Bench]] as
    * explicit `*_train` micros plus stored-model SERVE micros instead of
    * through their judged registry entries — their judged entries time
    * training under a query protocol, which hides serve-path regressions
    * (the round-12 verdict's top finding). */
  private val Tier2: Set[String] = Set(
    "dd_prefix_pairs", "tx_boilerplate",
    "dd_winnow_pairs", "ev_triangles",
    // round-15: the zero-fill (type,day) grid shape — with dd_prefix_pairs
    // (already above) these are the two shapes the sf1 rehearsal proved
    // most scale-sensitive, so both stay in the per-round slope table
    "dq_mann_kendall")

  def all: Seq[Q] = {
    val qs = (queries.CoreQueries.all ++ queries.ExtQueries.all ++
      queries.PipelineQueries.all ++ queries.SurfaceQueries.all)
      .map(q => if (Tier2(q.name)) q.copy(headline2 = true) else q)
    val dups = qs.groupBy(_.name).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    val missing = Tier2 -- qs.map(_.name).toSet
    require(missing.isEmpty, s"tier-2 names not in registry: $missing")
    qs
  }

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
