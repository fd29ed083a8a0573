package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** The unified fleet maintenance: `compactStores` must discover every
  * manifest-pointer store under a root (flat AND multi-table layouts),
  * rewrite each live version to one file per table, preserve the data
  * exactly, and be idempotent — a second run finds nothing to do.
  */
class MaintenanceJobSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def partFiles(p: Path): Long = {
    val s = Files.walk(p)
    try s.iterator().asScala.count(f =>
      f.getFileName.toString.startsWith("part-")).toLong
    finally s.close()
  }

  test("fleet compaction: discovery, file reduction, data identity, idempotence") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-maint")
    // the test session's AQE coalesces every tiny merge to ONE part file,
    // which leaves nothing to compact — the bench/production regime
    // (32+ shuffle partitions, real batch sizes) writes
    // shuffle-partition-many files per version, which is the read
    // amplification this job exists to fix. Pin that regime for the
    // writes, restore after.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
    // flat store: several merges => several versions' worth of part files
    val flat = new StreamApply.ParquetUpsertStore(spark,
      s"$root/a/flat", "key", "seq", "op", "d", Seq("value"))
    (0 until 3).foreach { b =>
      flat.merge((0 until 40).map(i =>
        (i.toLong % 20, (b * 100 + i).toLong, if (i % 7 == 0) "d" else "u",
          i * 1.5)).toDF("key", "seq", "op", "value"), b.toLong)
    }
    // multi-table store (IVM: state/ + agg/ in one version dir)
    val ivm = new StreamApply.IvmUpsertStore(spark,
      s"$root/b/ivm", "key", "seq", "op", "d", Seq("cat", "value"), "cat")
    (0 until 2).foreach { b =>
      ivm.merge((0 until 30).map(i =>
        (i.toLong % 15, (b * 100 + i).toLong, "u", s"c${i % 3}", i * 0.5))
        .toDF("key", "seq", "op", "cat", "value"), b.toLong)
    }
    val flatBefore = flat.view().orderBy("key").collect().toSeq
    val ivmBefore = ivm.view().orderBy("key").collect().toSeq
    val aggBefore = ivm.aggView().orderBy("cat").collect().toSeq
    val filesBefore = partFiles(root)
    assert(filesBefore > 3, s"fleet must have accreted files: $filesBefore")

    val done = StreamApply.compactStores(spark, root.toString)
    assert(done.map(_._1).toSet ==
      Set(s"$root/a/flat", s"$root/b/ivm"),
      s"discovery missed a store: $done")
    assert(done.forall { case (_, b, a) => a < b },
      s"compaction must reduce files: $done")
    // one file per table: flat store 1, ivm 2 (state + agg)
    assert(done.map(_._3).sum == 3, s"expected 1 file per table: $done")

    // data identity through the rewrite, for every view
    assert(flat.view().orderBy("key").collect().toSeq == flatBefore)
    assert(ivm.view().orderBy("key").collect().toSeq == ivmBefore)
    assert(ivm.aggView().orderBy("cat").collect().toSeq == aggBefore)

    // idempotence: the second run has nothing to rewrite
    assert(StreamApply.compactStores(spark, root.toString).isEmpty)

    // and the compacted stores still accept merges afterwards
    flat.merge(Seq((1L, 9999L, "u", 42.0)).toDF("key", "seq", "op", "value"), 99L)
    assert(flat.view().filter(col("key") === 1L).collect()
      .head.getDouble(3) == 42.0)
    } finally spark.conf.set(coalesceKey, prior)
  }

  test("maintenance run is a no-op on an empty or absent root") {
    assert(StreamApply.compactStores(spark, "/nonexistent/graft").isEmpty)
    val empty = Files.createTempDirectory("graft-maint-empty")
    assert(StreamApply.compactStores(spark, empty.toString).isEmpty)
  }

  test("census separates 'born compact' from 'saw nothing' (the r13 0/0/0 marker)") {
    import spark.implicits._
    // Under the DEFAULT session (AQE coalescing on — the bench dials'
    // regime) a freshly-merged store's live version is ONE part file,
    // so the fleet pass rewrites nothing and the old marker read
    // 0/0/0 — indistinguishable from an empty walk. The census carries
    // the missing facts: stores discovered, stores with a committed
    // version, live files.
    val root = Files.createTempDirectory("graft-maint-census")
    val s1 = new StreamApply.ParquetUpsertStore(spark,
      s"$root/s1", "key", "seq", "op", "d", Seq("value"))
    s1.merge((0 until 10).map(i => (i.toLong, i.toLong, "u", i * 1.0))
      .toDF("key", "seq", "op", "value"), 0L)
    val census = StreamApply.storeCensus(root.toString)
    assert(census.map(_._1) == Seq(s"$root/s1"))
    val live = census.flatMap(_._2).sum
    assert(live >= 1, s"committed store must census positive files: $census")
    // nothing to rewrite, but the census proves the fleet exists
    assert(StreamApply.compactStores(spark, root.toString).isEmpty
      || live > 1) // (if AQE didn't coalesce, compaction ran instead)
    // an absent root censuses EMPTY — the "saw nothing" shape
    assert(StreamApply.storeCensus("/nonexistent/graft").isEmpty)
  }
}
