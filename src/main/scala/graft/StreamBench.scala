package graft

import org.apache.spark.sql.SparkSession

/** Focused streaming-throughput harness: runs ONLY the upsert and IVM
  * micro-benchmarks — the EXACT [[StreamFeeds]] workloads behind
  * `Bench`'s `upsert_rows_per_sec` / `ivm_rows_per_sec` — repeated
  * `reps` times, so a streaming-store change can be A/B'd in ~a minute
  * instead of behind the full batch bench. The batch count is a
  * parameter because per-batch overhead is itself a measurement axis
  * (the task-binary-size investigation ran `StreamBench 2 10`).
  *
  * Usage: runMain graft.StreamBench [reps] [nBatches]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val nb = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    StreamFeeds.timeUpsert(spark, 1000, 100, 2)    // warmup
    StreamFeeds.timeIvm(spark, 1000, 100, 2)       // warmup
    StreamFeeds.timeChunkDedup(spark, 1000, 2)     // warmup
    for (r <- 1 to reps) {
      println(f"STREAMBENCH rep=$r nb=$nb upsert=${StreamFeeds.timeUpsert(spark, 100000, 10000, nb)}%.0f rows/s")
      println(f"STREAMBENCH rep=$r nb=$nb ivm=${StreamFeeds.timeIvm(spark, 100000, 10000, nb)}%.0f rows/s")
      println(f"STREAMBENCH rep=$r nb=$nb chunk=${StreamFeeds.timeChunkDedup(spark, 20000, nb)}%.0f docs/s")
    }
    spark.stop()
  }
}
