package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the named
  * queries (or all headline queries) — the feedback loop for the scale
  * checklist: filters/projections reaching the parquet scan, broadcasts
  * where a side is small, TakeOrderedAndProject for top-k, no stray
  * shuffles or interpreted expressions in hot paths.
  *
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Registry.all.filter(_.headline).map(_.name)
    names.foreach { n =>
      println(s"========== $n ==========")
      Registry.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
