package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Layout → pruning contract: a partition-column filter must surface as
  * PartitionFilters (directories never listed), and a range predicate on
  * a sorted layout must surface as PushedFilters (rowgroups skipped by
  * min/max stats). These plan properties ARE the 100 TB scan story.
  */
class LayoutSpec extends SparkSpec {

  test("partitioned write: lang filter becomes a PartitionFilter, not a row filter") {
    val dir = Files.createTempDirectory("graft-layout-part").toString
    Layout.writePartitioned(graft.Tables.documents(spark, sf), dir, "lang")
    val q = Layout.read(spark, dir).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"lang filter did not prune partitions:\n$plan")
    // correctness: partition column round-trips
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("sorted write: range predicate is pushed to the parquet scan") {
    val dir = Files.createTempDirectory("graft-layout-sort").toString
    Layout.writeSorted(graft.Tables.documents(spark, sf), dir, "doc_id")
    val q = Layout.read(spark, dir).filter(col("doc_id") < 100)
    val plan = q.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*LessThan\\(doc_id".r.findFirstIn(plan).isDefined,
      s"doc_id range predicate not pushed:\n$plan")
    assert(q.count() ==
      graft.Tables.documents(spark, sf).filter(col("doc_id") < 100).count())
    // the layout really is range-partitioned: each file's ids are disjoint
    val perFile = Layout.read(spark, dir)
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ =>
    }
  }

  test("bucketed tables join with no Exchange (and no Sort) on either side") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val agg = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    Layout.writeBucketed(ev, "ev_bucketed", "user_id")
    Layout.writeBucketed(agg, "ev_user_stats", "user_id")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val ordKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.get(key)
    val prevOrd = spark.conf.get(ordKey, "false")
    spark.conf.set(key, "-1") // force the sort-merge path a big-big join takes
    // report the per-file sort to the planner — sound here because
    // writeBucketed guarantees one file per bucket
    spark.conf.set(ordKey, "true")
    try {
      val j = Layout.readTable(spark, "ev_bucketed")
        .join(Layout.readTable(spark, "ev_user_stats"), Seq("user_id"))
      j.collect() // finalize the adaptive plan
      val p = j.queryExecution.executedPlan.toString
      // the whole point of the bucketed layout: both sides arrive
      // pre-partitioned (bucketBy) and pre-sorted (sortBy + one file per
      // bucket), so the join plans neither an Exchange nor a Sort
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(!p.contains(" Sort ["), s"bucket sort order not consumed:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      // correctness parity with the plain (shuffling) join
      assert(j.count() == ev.join(agg, Seq("user_id")).count())
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(ordKey, prevOrd)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS ev_user_stats")
    }
  }

  test("z-order clustering prunes scans on BOTH dimensions") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    val total = ev.count()
    val zDir = Files.createTempDirectory("graft-layout-z").toString
    val sDir = Files.createTempDirectory("graft-layout-s").toString
    // 64 z-cells over 16 files: ~4 cells per file, so a one-dimension
    // predicate's z-intervals cover a minority of files (see the
    // granularity note on writeZOrdered)
    Layout.writeZOrdered(ev, zDir, "user_id", "event_id",
      partitions = 16, bits = 3)
    Layout.writeSorted(ev, sDir, "event_id", partitions = 16)
    // AQE off so the executed plan exposes the scan node's metrics directly
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      def scanned(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.sum
      }
      // a predicate on the SECOND dimension — invisible to the
      // event_id-sorted layout's stats, tight under the z layout. One
      // key of the 15 at this sf (~7% of rows): selective enough that
      // pruning is possible at all
      val zRows = scanned(Layout.read(spark, zDir).filter(col("user_id") === 3))
      val sRows = scanned(Layout.read(spark, sDir).filter(col("user_id") === 3))
      assert(sRows == total,
        s"single-key sort unexpectedly pruned the other column: $sRows")
      assert(zRows * 2 < sRows,
        s"z layout must prune the second dimension: z=$zRows sorted=$sRows")
      // the first dimension prunes on the z layout too
      val zFirst = scanned(Layout.read(spark, zDir).filter(col("event_id") < 50))
      assert(zFirst * 2 < total,
        s"z layout must prune the first dimension: $zFirst of $total")
      // pruning never costs correctness
      assert(Layout.read(spark, zDir).filter(col("user_id") === 3).count() ==
        ev.filter(col("user_id") === 3).count())
    } finally spark.conf.set(aqeKey, prev)
  }

  test("CSV and JSON-lines round trips are lossless under the declared schema") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value", "props")
    val schema = ev.schema
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = rows(ev)

    val csvDir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Layout.writeCsv(ev, csvDir)
    val csvBack = Layout.readCsv(spark, csvDir, schema)
    assert(csvBack.schema == schema, "csv schema drifted")
    assert(rows(csvBack) == want, "csv round trip lost data")

    val jsonDir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Layout.writeJsonl(ev, jsonDir)
    val jsonBack = Layout.readJsonl(spark, jsonDir, schema)
    assert(rows(jsonBack) == want, "jsonl round trip lost data")

    // explicit-schema reads must not scan for inference: both plans are
    // a single FileScan with the declared ReadSchema
    val p = csvBack.queryExecution.executedPlan.toString
    assert(p.contains("FileScan csv"), s"unexpected csv plan:\n$p")
  }
}
