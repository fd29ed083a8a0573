package graft

import org.apache.spark.sql.SparkSession

/** Focused streaming-throughput harness: runs ONLY the streaming
  * micro-benchmarks (same feeds as [[Bench]]'s streaming section),
  * repeated `reps` times, so a streaming change can be A/B'd in ~a
  * minute instead of behind the 167-query batch bench. Prints one line
  * per rep per path.
  *
  * Usage: runMain graft.StreamBench [reps]
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
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def timeUpsert(n: Int, nKeys: Int, nBatches: Int): Double = {
      val dir = java.nio.file.Files.createTempDirectory("sb-upsert").toString
      val store = new streaming.StreamApply.ParquetUpsertStore(spark, dir,
        key = "key", seq = "seq", opCol = "op", deleteOp = "d",
        payloadCols = Seq("value", "ts"))
      val in = MemoryStream[BenchEv](16)
      val q = streaming.StreamApply.upsertWriter(in.toDF(), store, s"$dir/ckpt").start()
      val batches = (0 until n).map(i => BenchEv(i.toLong, i % nKeys,
          if (i % 17 == 0) "d" else "u", i * 0.5,
          new java.sql.Timestamp(1700000000000L + i)))
        .grouped(n / nBatches).toSeq
      val t0 = System.nanoTime()
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
      n / ((System.nanoTime() - t0) / 1e9)
    }

    def timeIvm(n: Int, nKeys: Int, nBatches: Int): Double = {
      val dir = java.nio.file.Files.createTempDirectory("sb-ivm").toString
      val store = new streaming.StreamApply.IvmUpsertStore(spark, dir,
        key = "key", seq = "seq", opCol = "op", deleteOp = "d",
        payloadCols = Seq("cat", "value"), aggCol = "cat")
      val in = MemoryStream[BenchCatEv](16)
      val q = streaming.StreamApply.ivmWriter(in.toDF(), store, s"$dir/ckpt").start()
      val batches = (0 until n).map(i => BenchCatEv(i.toLong, i % nKeys,
          if (i % 17 == 0) "d" else "u", s"c${i % 5}", i * 0.5))
        .grouped(n / nBatches).toSeq
      val t0 = System.nanoTime()
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
      n / ((System.nanoTime() - t0) / 1e9)
    }

    timeUpsert(1000, 100, 2) // warmup
    timeIvm(1000, 100, 2)    // warmup
    for (r <- 1 to reps) {
      println(f"STREAMBENCH rep=$r nb=$nb upsert=${timeUpsert(100000, 10000, nb)}%.0f rows/s")
      println(f"STREAMBENCH rep=$r nb=$nb ivm=${timeIvm(100000, 10000, nb)}%.0f rows/s")
    }
    spark.stop()
  }
}
