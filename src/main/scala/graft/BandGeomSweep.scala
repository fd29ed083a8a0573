package graft

import org.apache.spark.sql.SparkSession

/** Offline LSH banding-geometry sweep (r13): run the full d3 pipeline
  * (sketch → banded candidates → exact confirm) under each candidate
  * geometry and score it with the d25 recall eval. Prints one JSON line
  * per geometry: candidate volume (the cost dial — every candidate pays
  * an exact-confirm intersection), confirmed pairs, probe recall, and
  * wall seconds. The adopted default ([[graft.ext.Dedup.LshPerms]] /
  * [[graft.ext.Dedup.LshBands]]) is whatever this sweep justified on
  * the real corpus — see PLANS.md.
  *
  * Usage: runMain graft.BandGeomSweep [sfDir] [geom1,geom2,...] where a
  * geometry is `bands` (over 16 perms, legacy) or `perms/bands` (e.g.
  * `64/8` = 8 bands × 8 rows over 64 permutations).
  *
  * `SPARK_GRAFT_VOLUME_ONLY=1` skips the joins and upper-bounds the
  * candidate count from band-key occupancy alone (Σ C(cnt,2)) — one
  * corpus aggregation, for sizing a bigger-SF run before paying it.
  */
object BandGeomSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val geoms: Seq[(Int, Int)] = args.drop(1).headOption
      .map(_.split(",").map(_.trim).toSeq.map { g =>
        g.split("/") match {
          case Array(b) => (16, b.toInt)
          case Array(p, b) => (p.toInt, b.toInt)
          case _ => sys.error(s"bad geometry: $g")
        }
      }).getOrElse(Seq((16, 2), (16, 4), (64, 8)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val volumeOnly = sys.env.get("SPARK_GRAFT_VOLUME_ONLY").contains("1")
    geoms.foreach { case (perms, bands) =>
      require(perms % bands == 0 && perms <= graft.ext.Portable.A.size,
        s"bad geometry: $perms/$bands")
      if (volumeOnly) {
        import org.apache.spark.sql.functions._
        val t0 = System.nanoTime()
        // SPARK_GRAFT_REPLICATE=k (r14): probe the volume of a
        // REPLICA-HEAVY corpus — every document exact-copied k times
        // (ids remapped i*k+r). The sf-synth corpora turned out to hold
        // ZERO exact duplicates (their shard replicas carry distinct
        // suffix tokens), so the d1→d3 rep-collapse argument needs a
        // corpus that actually has the k-copy families it is about;
        // bound(replicated)/bound(original) is the measured reduction
        // the exact-first pipeline order buys (≈ k² per family).
        val repl = sys.env.get("SPARK_GRAFT_REPLICATE").map(_.toInt).getOrElse(1)
        val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text")
        val docsF =
          if (repl <= 1) docs0
          else docs0.select(explode(array((0 until repl).map(r =>
              col("doc_id") * repl + r): _*)).as("doc_id"), col("text"))
        val sk = ext.Dedup.sketchOfG(docsF, bands, perms)
        // capped_bound (r14): the candidate volume the engine ACTUALLY
        // pays under the HotBandKeyCap star emission — hot keys
        // contribute n−1 instead of C(n,2)
        val cap = graft.ext.Dedup.HotBandKeyCap
        val vol = sk
          .select(explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"), col(s"bk$b").as("key"))): _*)).as("bk"))
          .groupBy(col("bk.band"), col("bk.key")).count()
          .agg(sum(expr("count * (count - 1) / 2")).as("bound"),
            max("count").as("hottest"),
            sum(when(col("count") > cap, col("count") - 1)
              .otherwise(expr("count * (count - 1) / 2"))).as("capped_bound"),
            sum(when(col("count") > cap, 1L).otherwise(0L)).as("hot_keys"))
          .collect()(0)
        val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
        println(s"""{"sf":"$sfDir","n_perms":$perms,"n_bands":$bands,""" +
          s""""volume_bound":${vol.get(0)},"hottest_band_key":${vol.get(1)},""" +
          s""""capped_bound":${vol.get(2)},"hot_keys":${vol.get(3)},"cap":$cap,""" +
          s""""sketch_sec":$sec}""")
      } else {
        val t0 = System.nanoTime()
        val row = ext.Dedup.lshGeometrySweep(spark, sfDir, bands, perms).collect()(0)
        val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
        println(s"""{"sf":"$sfDir","n_perms":$perms,""" +
          s""""n_bands":${row.getAs[Int]("n_bands")},""" +
          s""""rows_per_band":${row.getAs[Int]("rows_per_band")},""" +
          s""""candidates":${row.getAs[Long]("candidates")},""" +
          s""""confirmed":${row.getAs[Long]("confirmed")},""" +
          s""""n_truth":${row.getAs[Long]("n_truth")},""" +
          s""""n_found":${row.getAs[Long]("n_found")},""" +
          s""""recall_ppm":${row.getAs[Long]("recall_ppm")},""" +
          s""""sec":$sec}""")
      }
    }
    spark.stop()
  }
}
