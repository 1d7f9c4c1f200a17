package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end through the noop
  * sink (full materialization of every column — `count()` would let Catalyst
  * prune the projections we mean to measure).
  *
  * The JSON also carries `calibration_sec`: a fixed, scale-factor-independent
  * reference workload (4M-row hash + sort, measured min-of-5 like every
  * query). Because the workload never changes, round-over-round drift in
  * this number is machine/co-tenant load, not engine change — divide the
  * query times by (calibration_sec / its historical floor) to compare runs
  * across differently-loaded environments.
  */
object Bench {

  /** Fixed-size calibration workload: deterministic, SF-independent,
    * exercising codegen arithmetic + one range-partitioned sort, the same
    * resources the real queries use. */
  private def calibration(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.range(0, 4000000L)
      .select(xxhash64(col("id")).as("k"))
      .orderBy("k")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val headline = Registry.all.filter(_.headline)
    // one warm-up pass amortizes JVM/codegen warm-up out of the measurement
    headline.foreach { q =>
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // min of 5 measured runs: the steady-state cost, robust to background
    // load on a shared machine (observed 3-8× spikes from co-tenant load)
    val results = headline.map { q =>
      var failed = false
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not report a flatteringly tiny time
      q.name -> (if (failed) -1.0 else times.min)
    }
    // calibration sentinel: same warm-up + min-of-5 protocol as the queries
    calibration(spark).write.format("noop").mode("overwrite").save()
    val calib = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      calibration(spark).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","calibration_sec":$calib%.3f,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
