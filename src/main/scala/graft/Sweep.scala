package graft

import org.apache.spark.sql.SparkSession

/** Decade scaling-sweep runner (PLANS.md "Empirical scaling sweep"):
  * times each named query COLD — shared memoized frames cleared before
  * every run, so a query pays its whole dependency chain — over each
  * data directory in order. The decade ratio between two directories a
  * factor of 10 apart is the scaling signal; `tools/make_sf1_synth.py`
  * builds the 10x shard-composition of sf0.1 used as the upper point.
  *
  * Usage: runMain graft.Sweep <dir1,dir2,...> <q1,q2,...>
  */
object Sweep {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val qs = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup at the smallest SF (Bench's discipline): plans compiled,
    // codegen JIT'd, classloading done — the decade ratio must compare
    // engine work, not which query happened to pay JVM cold-start
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else dirs.head
    }
    qs.foreach { q =>
      try Bench.force(SparkEntry.queries(q)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    for (dir <- dirs; q <- qs) {
      ext.Dedup.clearMemos(spark)
      val t0 = System.nanoTime()
      // Bench.force, not count(): count lets Catalyst prune a pure
      // projection query down to row counting (see Bench.force)
      val n = Bench.force(SparkEntry.queries(q)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SWEEP dir=$dir q=$q t=$dt%.2f rows=$n")
    }
    spark.stop()
  }
}
