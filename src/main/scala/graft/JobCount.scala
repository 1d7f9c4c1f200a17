package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic main: count Spark JOBS triggered by CONSTRUCTING (not
  * running) each named registry query's DataFrame — the
  * plan-only-callers-run-nothing audit. A bare
  * `localCheckpoint(eager = false)` executes its fragment's exchanges at
  * construction under AQE (the plans/LazyCheckpoint root cause), and a
  * statically-planned BROADCAST join submits its collect job at
  * RDD-construction (prepare) time even with AQE off — both surface here
  * as nonzero counts. Pass a name twice to separate one-time session
  * work (file-listing jobs) from per-construction work: the steady state
  * is the second count.
  *
  * Usage: runMain graft.JobCount <queryName> [queryName ...]
  * JOBCOUNT_VERBOSE=1 prints each job's stage names for attribution. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("JOBCOUNT_VERBOSE")) {
          val desc = Option(js.properties)
            .map(_.getProperty("spark.job.description", "?")).getOrElse("?")
          println(s"[jobstart] ${js.stageInfos.map(_.name).mkString(" | ")} :: $desc")
        }
        ()
      }
    })
    for (n <- args) {
      val before = jobs.get()
      val df = Registry.byName(n).fn(spark, sfDir)
      df.queryExecution.executedPlan // force planning only
      Thread.sleep(500)
      println(s"[jobcount] $n construction_jobs=${jobs.get() - before}")
    }
    spark.stop()
  }
}
