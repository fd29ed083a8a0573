package graft

import org.apache.spark.sql.SparkSession

/** Offline LSH banding-geometry sweep (r13): run the full d3 pipeline
  * (sketch → banded candidates → exact confirm) under each candidate
  * geometry and score it with the d25 recall eval. Prints one JSON line
  * per geometry: candidate volume (the cost dial — every candidate pays
  * an exact-confirm intersection), confirmed pairs, probe recall, and
  * wall seconds. The adopted default ([[graft.ext.Dedup.LshBands]]) is
  * whatever this sweep justified on the real corpus — see PLANS.md.
  *
  * Usage: runMain graft.BandGeomSweep [sfDir] [bands1,bands2,...]
  */
object BandGeomSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val geoms = args.drop(1).headOption
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2, 4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    geoms.foreach { nb =>
      require(16 % nb == 0, s"bands must divide 16: $nb")
      val t0 = System.nanoTime()
      val row = ext.Dedup.lshGeometrySweep(spark, sfDir, nb).collect()(0)
      val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
      println(s"""{"sf":"$sfDir","n_bands":${row.getAs[Int]("n_bands")},""" +
        s""""rows_per_band":${row.getAs[Int]("rows_per_band")},""" +
        s""""candidates":${row.getAs[Long]("candidates")},""" +
        s""""confirmed":${row.getAs[Long]("confirmed")},""" +
        s""""n_truth":${row.getAs[Long]("n_truth")},""" +
        s""""n_found":${row.getAs[Long]("n_found")},""" +
        s""""recall_ppm":${row.getAs[Long]("recall_ppm")},""" +
        s""""sec":$sec}""")
    }
    spark.stop()
  }
}
