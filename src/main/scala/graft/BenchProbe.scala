package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Where does a bench query's wall clock actually go? Runs one query N
  * times in a Bench-identical session and prints, per run:
  *
  *   wall          total seconds (same window Bench times)
  *   analysis/opt/plan  Catalyst phase ms from QueryPlanningTracker
  *   execMs        sum of executor task run time across the run's stages
  *   jobs/stages/tasks  scheduler shape (each job submission is a fixed
  *                      driver-side constant; AQE multiplies them)
  *
  * Diagnoses the fixed per-query job constant the judge flagged: for a
  * query DuckDB finishes in 10 ms, wall − execMs/32 ≈ pure scheduling +
  * planning overhead. Usage:
  *   sbt "runMain graft.BenchProbe q11_two_hop_join 4 /root/testdata/sf0.1"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q11_two_hop_join").split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 4
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val execMs = new AtomicLong; val jobs = new AtomicInteger
    val stages = new AtomicInteger; val tasks = new AtomicInteger
    // Per-stage timeline (enabled with SPARK_GRAFT_PROBE_STAGES=1): for
    // each stage, when it was SUBMITTED relative to the run's t0, how
    // long it ran, and its task count — separates in-stage time (task
    // run) from the dead time between stages (planning, broadcast
    // collection, job-boundary scheduling), which aggregate counters
    // can't distinguish.
    val stageLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, Long, Int)]())
    val probeStages = sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        execMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        if (probeStages)
          stageLog.add((sc.stageInfo.stageId,
            sc.stageInfo.submissionTime.getOrElse(0L),
            sc.stageInfo.completionTime.getOrElse(0L),
            sc.stageInfo.numTasks))
        ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    for (name <- names; i <- 0 until reps) {
      execMs.set(0); jobs.set(0); stages.set(0); tasks.set(0)
      stageLog.clear()
      val wall0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuilt = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val build = (tBuilt - t0) / 1e9
      val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
        s"$p=${s.endTimeMs - s.startTimeMs}ms"
      }.mkString(" ")
      // listener bus is async; give it a beat before reading counters
      Thread.sleep(300)
      println(f"[probe] $name run=$i wall=$wall%.3f build=$build%.3f " +
        f"execMs=${execMs.get} jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} $phases")
      if (probeStages) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.sortBy(_._2).foreach { case (id, sub, done, nt) =>
          println(f"[stage] $name run=$i id=$id at=+${sub - wall0}%4dms " +
            f"dur=${done - sub}%4dms tasks=$nt")
        }
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
