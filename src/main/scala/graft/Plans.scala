package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Offline plan dump: writes `.explain("formatted")` for the named
  * registry queries (or all of them) to `<outDir>/<name>_<tag>.txt` —
  * the optimization rounds' evidence files (`plans/r14/...`). Pure
  * metadata: plans are captured from the analyzed frames without
  * executing anything, so a full-registry dump is seconds, not a bench.
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <tag> [q1,q2,...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag) = args.take(3)
    val only: Option[Set[String]] = args.lift(3).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val unknown = only.map(_ -- SparkEntry.queries.keySet).getOrElse(Set.empty)
    require(unknown.isEmpty, s"unknown keys: $unknown")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
          println(s"[plans] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
