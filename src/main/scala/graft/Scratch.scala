package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment harness for the optimization round — times
  * alternative formulations of a hot query's stages against each other.
  * Not part of any query path; never registered.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Long = {
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$r")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val which = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "d13")
    if (which.contains("d13")) ext.Dedup.scratchD13Variants(spark, sfDir, time, force)
    if (which.contains("d23")) ext.Dedup.scratchD23Variants(spark, sfDir, time, force)
    spark.stop()
  }
}
