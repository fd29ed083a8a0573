package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming compliance monitor must equal the batch rule fold over
  * the whole feed under any micro-batching, and the feed deliberately
  * contains violations of BOTH rules (out-of-range values, unknown
  * types) — a monitor tested only on clean data proves nothing.
  */
class QualityStreamSpec extends SparkSpec {

  case class QE(ts: java.sql.Timestamp, event_type: String, value: Double)

  private val DayUs = 86400000000L
  private val base = 1700006400000000L // µs, mid-day so windows straddle rows

  // 300 events over ~3.5 days; every 23rd value is out of range, every
  // 31st type is unknown — both rules fire, on different rows
  private val evs = (0 until 300).map { i =>
    QE(new java.sql.Timestamp((base + i.toLong * 17L * 60000000L) / 1000L),
      if (i % 31 == 0) "unknown" else Seq("click", "view", "error")(i % 3),
      if (i % 23 == 0) 500.0 + i else (i % 490).toDouble + 0.5)
  }

  // the batch fold of the same declared rules, day-truncated event time
  private def expected(es: Seq[QE]): Map[Long, (Long, Long, Long)] =
    es.groupBy(e => (e.ts.getTime * 1000L) / DayUs * DayUs).map { case (d, xs) =>
      d -> ((xs.length.toLong,
        xs.count(e => e.value < 0.0 || e.value >= 500.0).toLong,
        xs.count(e => !Set("click", "error", "purchase", "signup", "view")
          .contains(e.event_type)).toLong))
    }

  private def run(batches: Seq[Seq[QE]]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[QE]
    val name = s"quality_out_${System.nanoTime()}"
    val q = QualityStream.complianceView(in.toDF())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    // update mode re-emits a window per change: keep the LAST emission
    spark.table(name).collect().zipWithIndex
      .groupBy(_._1.getTimestamp(0)).map { case (ws, rs) =>
        val r = rs.maxBy(_._2)._1
        ws.getTime * 1000L -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
      }
  }

  test("stream equals the batch rule fold, independent of batching") {
    val exp = expected(evs)
    assert(exp.values.map(_._2).sum > 0L, "no range violations in feed — vacuous")
    assert(exp.values.map(_._3).sum > 0L, "no type violations in feed — vacuous")
    assert(exp.size >= 3, "need several day windows")
    assert(run(Seq(evs)) == exp, "1-batch run diverged from batch fold")
    assert(run(Seq(evs.take(50), evs.slice(50, 220), evs.drop(220))) == exp,
      "3-batch run diverged from batch fold")
    assert(run(evs.grouped(37).toSeq) == exp, "many-batch run diverged")
  }

  case class GE(seq: Long, eid: Long, key: Int, op: String, value: Double,
    event_type: String)

  test("gated ingest: violations quarantine to the DLQ, clean state equals the clean-substream fold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate").toString
    // clean side: the REAL serving upsert (latest per entity key,
    // tombstones honored); DLQ side: event grain (eid — every
    // quarantined event retained for post-fix replay)
    val clean = new StreamApply.ParquetUpsertStore(spark, s"$dir/clean",
      key = "key", seq = "seq", opCol = "op", deleteOp = "d",
      payloadCols = Seq("value", "event_type"))
    val dlq = new StreamApply.ParquetUpsertStore(spark, s"$dir/dlq",
      key = "eid", seq = "seq", opCol = "op", deleteOp = "never",
      payloadCols = Seq("key", "value", "event_type"))
    def ge(seq: Long, key: Int, op: String, v: Double, t: String) =
      GE(seq, seq, key, op, v, t)
    // violations on both rules; a DELETE with violating payload columns
    // must still pass (tombstones gate-exempt); key 7's bad insert is
    // later corrected by a clean update
    val evs = Seq(
      ge(1, 1, "c", 1.0, "view"), ge(2, 2, "c", 999.0, "view"),
      ge(3, 3, "c", 5.0, "unknown"), ge(4, 1, "d", -1.0, "unknown"),
      ge(5, 7, "c", 777.0, "click"), ge(6, 7, "u", 7.0, "click"),
      ge(7, 8, "u", -0.5, "purchase"), ge(8, 9, "u", 499.99, "signup"))
    val in = MemoryStream[GE]
    val q = QualityStream.gatedSink(in.toDF(), clean, dlq, s"$dir/ckpt").start()
    try {
      for (b <- Seq(evs.take(3), evs.slice(3, 6), evs.drop(6))) {
        in.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    // the rule fold, delete-exempt
    val bad = Set("click", "error", "purchase", "signup", "view")
    val expectBad = evs.filter(e => e.op != "d" &&
      (e.value < 0.0 || e.value >= 500.0 || !bad.contains(e.event_type)))
    val dlqSeqs = dlq.view().select("eid").collect().map(_.getLong(0)).toSet
    assert(dlqSeqs == expectBad.map(_.eid).toSet, s"dlq $dlqSeqs")
    // clean view == batch materialization of the clean substream
    val cleanEvs = evs.filterNot(expectBad.contains)
    val expectView = cleanEvs.groupBy(_.key).flatMap { case (k, xs) =>
      val last = xs.maxBy(_.seq)
      if (last.op == "d") None else Some(k -> (last.seq, last.value))
    }
    val gotView = clean.view().collect()
      .map(r => r.getAs[Int]("key") ->
        ((r.getAs[Long]("seq"), r.getAs[Double]("value")))).toMap
    assert(gotView == expectView, s"clean view $gotView != $expectView")
    // quarantined events never reached serving state in any version
    val cleanAllSeqs = clean.snapshot().select("seq").collect()
      .map(_.getLong(0)).toSet
    assert((cleanAllSeqs & expectBad.map(_.seq).toSet).isEmpty,
      "a quarantined event leaked into the serving store")
  }

  case class GN(seq: Long, eid: Long, key: Int, op: String,
    value: Option[Double], event_type: Option[String])

  test("null payloads quarantine — they must not vanish from the gate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate-null").toString
    val clean = new StreamApply.ParquetUpsertStore(spark, s"$dir/clean",
      key = "key", seq = "seq", opCol = "op", deleteOp = "d",
      payloadCols = Seq("value", "event_type"))
    val dlq = new StreamApply.ParquetUpsertStore(spark, s"$dir/dlq",
      key = "eid", seq = "seq", opCol = "op", deleteOp = "never",
      payloadCols = Seq("key", "value", "event_type"))
    // a three-valued violation predicate drops these rows from BOTH
    // filter(p) and filter(!p) — the regression this test pins
    val evs = Seq(
      GN(1, 1, 1, "c", Some(1.0), Some("view")),
      GN(2, 2, 2, "c", None, Some("view")),
      GN(3, 3, 3, "c", Some(2.0), None))
    val in = MemoryStream[GN]
    val q = QualityStream.gatedSink(in.toDF(), clean, dlq, s"$dir/ckpt").start()
    try { in.addData(evs); q.processAllAvailable() } finally q.stop()
    val dlqSeqs = dlq.view().select("eid").collect().map(_.getLong(0)).toSet
    val cleanSeqs = clean.view().select("seq").collect().map(_.getLong(0)).toSet
    assert(dlqSeqs == Set(2L, 3L), s"null payloads must quarantine: $dlqSeqs")
    assert(cleanSeqs == Set(1L))
  }

  test("gated ingest: random feeds and batchings always conserve and classify exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val domain = Vector("click", "view", "error", "signup", "purchase", "bogus")
    val rnd = new scala.util.Random(42) // fixed seed — deterministic
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(60)
      val evs = (1 to n).map { i =>
        GE(i.toLong, i.toLong, rnd.nextInt(12),
          if (rnd.nextInt(10) == 0) "d" else "u",
          rnd.nextDouble() * 600.0 - 30.0, // spans both range violations
          domain(rnd.nextInt(domain.length)))
      }
      val cuts = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(n)).sorted.distinct
      val batches = (Seq(0) ++ cuts ++ Seq(n)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => evs.slice(a, b) }
        .filter(_.nonEmpty).toSeq
      val dir = java.nio.file.Files.createTempDirectory(s"graft-qprop$trial").toString
      val clean = new StreamApply.ParquetUpsertStore(spark, s"$dir/clean",
        key = "key", seq = "seq", opCol = "op", deleteOp = "d",
        payloadCols = Seq("value", "event_type"))
      val dlq = new StreamApply.ParquetUpsertStore(spark, s"$dir/dlq",
        key = "eid", seq = "seq", opCol = "op", deleteOp = "never",
        payloadCols = Seq("key", "value", "event_type"))
      val in = MemoryStream[GE]
      val q = QualityStream.gatedSink(in.toDF(), clean, dlq, s"$dir/ckpt").start()
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
      val isBad = (e: GE) => e.op != "d" &&
        (e.value < 0.0 || e.value >= 500.0 ||
          !Set("click", "error", "purchase", "signup", "view").contains(e.event_type))
      val dlqSeqs = dlq.view().select("eid").collect().map(_.getLong(0)).toSet
      assert(dlqSeqs == evs.filter(isBad).map(_.eid).toSet,
        s"trial $trial: DLQ diverged from the rule fold")
      val expectView = evs.filterNot(isBad).groupBy(_.key).flatMap { case (k, xs) =>
        val last = xs.maxBy(_.seq)
        if (last.op == "d") None else Some(k -> last.seq)
      }
      val gotView = clean.view().collect()
        .map(r => r.getAs[Int]("key") -> r.getAs[Long]("seq")).toMap
      assert(gotView == expectView, s"trial $trial: clean view diverged")
    }
  }

  test("a clean feed reports zero violations with full counts") {
    val clean = evs.map(e => e.copy(event_type = "view", value = 1.5))
    val got = run(Seq(clean))
    assert(got.values.forall { case (_, r, t) => r == 0L && t == 0L })
    assert(got.values.map(_._1).sum == clean.length.toLong)
  }
}
