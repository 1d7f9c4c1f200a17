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
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    headline: Boolean = false)

object Registry {
  def all: Seq[Q] = {
    val qs = queries.CoreQueries.all ++ queries.ExtQueries.all ++
      queries.PipelineQueries.all ++ queries.SurfaceQueries.all
    val dups = qs.groupBy(_.name).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
