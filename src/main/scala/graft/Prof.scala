package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Offline per-query profile: wall seconds, Spark job count, stage count,
  * task count, and summed executor task time for each named registry
  * query — separates "the cluster computed for N seconds" from "the
  * driver waited on N sequential tiny jobs", which a wall-clock bench
  * cannot distinguish. Methodology mirrors Bench (warmup at the smallest
  * SF, System.gc() between queries, min of two timed passes is NOT used —
  * this is a diagnostic, each query runs twice and both are printed).
  *
  * Usage: runMain graft.Prof <sfDir> q1,q2,...
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0)
    // per-stage detail for the current query (name → tasks, taskTime)
    val stageDetail = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val detail = sys.env.get("SPARK_GRAFT_PROF_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      }
    })
    // separate listener capturing stage-level aggregates with names
    if (detail) spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val name = si.name.take(90)
        val tt = si.taskMetrics.executorRunTime
        stageDetail.merge(f"${si.stageId}%05d $name",
          (si.numTasks.toLong, tt), (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })

    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown keys: $unknown")
    // warm every named query once (classloading, codegen)
    names.foreach { n =>
      try Bench.force(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-28s pass  wall_s  jobs stages  tasks  tasktime_s")
    for (pass <- 1 to 2) {
      ext.Dedup.clearMemos(spark)
      names.foreach { n =>
        System.gc()
        val (j0, s0, t0, tt0) = (jobs.get, stages.get, tasks.get, taskTimeMs.get)
        val w0 = System.nanoTime()
        try Bench.force(SparkEntry.queries(n)(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[prof] $n: $e") }
        val wall = (System.nanoTime() - w0) / 1e9
        // listener bus is async; give it a beat to drain
        Thread.sleep(150)
        println(f"$n%-28s $pass%4d  ${wall}%6.3f  ${jobs.get - j0}%4d ${stages.get - s0}%6d ${tasks.get - t0}%6d  ${(taskTimeMs.get - tt0) / 1e3}%9.3f")
        if (detail && pass == 2) {
          stageDetail.entrySet().stream()
            .sorted(java.util.Map.Entry.comparingByKey())
            .forEach { e =>
              println(f"    stage ${e.getKey}%-96s tasks=${e.getValue._1}%4d  tt=${e.getValue._2 / 1e3}%8.3f s")
            }
        }
        stageDetail.clear()
      }
    }
    spark.stop()
  }
}
