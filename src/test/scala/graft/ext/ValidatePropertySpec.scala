package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The drift monitors, property-checked: for ANY event set — including
  * boundary values exactly on bin edges, single-row corpora, and
  * all-in-one-half time ranges — the distributed queries equal a
  * driver-side fold of the same declared definitions (floor midpoint,
  * clamp-to-edge binning, floor-ppm shares). Fixed ScalaCheck seeds
  * (the scalatest bridge artifact is not on the offline classpath) —
  * deterministic across runs.
  */
class ValidatePropertySpec extends SparkSpec {

  private val baseUs = 1700000000000000L

  private val genEvents: Gen[List[(Long, Double, String)]] = for {
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      // whole MILLISECONDS: java.sql.Timestamp carries ms, so a µs-grain
      // dt would silently truncate on the Spark side while the driver
      // fold kept the full value — a mid-boundary flake waiting for the
      // right seed
      dtMs <- Gen.choose(0L, 30L * 86400000L) // up to 30 days
      dt = dtMs * 1000L
      v <- Gen.oneOf(
        Gen.choose(0.0, 520.0),                 // incl. out-of-domain
        Gen.oneOf(0.0, 50.0, 100.0, 499.999999, 500.0)) // bin edges
      t <- Gen.oneOf("click", "view", "error", "signup", "purchase")
    } yield (baseUs + dt, v, t))
  } yield rows

  private def sample(seed: Long): List[(Long, Double, String)] =
    genEvents.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  private def toDf(rows: List[(Long, Double, String)]) = {
    import spark.implicits._
    rows.map { case (us, v, t) =>
      (new java.sql.Timestamp(us / 1000L), v, t)
    }.toDF("ts", "value", "event_type")
  }

  private def ppm(n: Long, d: Long): Long =
    (BigInt(n) * 1000000 / BigInt(d)).toLong

  test("v4 equals the driver fold on random corpora (incl. bin edges)") {
    for (seed <- 1L to 12L) {
      val rows = sample(seed)
      val us = rows.map(_._1)
      val mid = (us.min + us.max) / 2 // non-negative: floor == truncate
      def bin(v: Double): Long =
        math.min(math.max(math.floor(v / 50.0), 0.0), 9.0).toLong
      val old = rows.filter(_._1 < mid); val nw = rows.filter(_._1 >= mid)
      val expected = (old.map(r => bin(r._2) -> "o") ++ nw.map(r => bin(r._2) -> "n"))
        .groupBy(_._1).map { case (b, xs) =>
          val no = xs.count(_._2 == "o").toLong
          val nn = xs.count(_._2 == "n").toLong
          val so = if (old.isEmpty) null else ppm(no, old.length.toLong)
          val sn = if (nw.isEmpty) null else ppm(nn, nw.length.toLong)
          b -> ((no, nn, so, sn))
        }
      val got = Validate.valueDriftOf(toDf(rows)).collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4)))
      }.toMap
      assert(got == expected, s"seed=$seed: $got != $expected")
    }
  }

  test("v5 equals the driver fold on random corpora") {
    val weekUs = 604800000000L
    for (seed <- 20L to 30L) {
      val rows = sample(seed)
      val wt = rows.groupBy(r => (r._1 / weekUs, r._3))
        .map { case (k, xs) => k -> xs.length.toLong }
      val perWeek = wt.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
      val perType = wt.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
      val grand = rows.length.toLong
      val expected = wt.map { case ((w, t), n) =>
        (w, t) -> ((n, ppm(n, perWeek(w)), ppm(perType(t), grand)))
      }
      val got = Validate.shareDriftOf(toDf(rows)).collect().map { r =>
        (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))
      }.toMap
      assert(got == expected, s"seed=$seed: $got != $expected")
    }
  }

  test("v8 equals the driver fold on random corpora (incl. 1-day and even/odd day counts)") {
    val dayUs = 86400000000L
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted; val c = s.length
      s((c + 1) / 2 - 1) + s(c / 2)
    }
    for (seed <- 40L to 52L) {
      val rows = sample(seed)
      val counts = rows.groupBy(_._1 / dayUs) // positive epochs: floor == truncate
        .map { case (d, xs) => d -> xs.length.toLong }
      val m2 = med2(counts.values.toSeq)
      val devs = counts.map { case (d, n) => d -> math.abs(2 * n - m2) }
      val m4 = med2(devs.values.toSeq)
      val expected = counts.map { case (d, n) =>
        val s = (BigInt(devs(d)) * 2000000 / BigInt(math.max(m4, 1L))).toLong
        d -> ((n, m2, devs(d), m4, s, s > Validate.VolumeAnomalyPpm))
      }
      val got = Validate.volumeAnomalyOf(toDf(rows)).collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6)))
      }.toMap
      assert(got == expected, s"seed=$seed: $got != $expected")
    }
  }

  test("v9 KS drift equals the driver fold on random corpora") {
    for (seed <- 60L to 72L) {
      val rows = sample(seed)
      val us = rows.map(_._1)
      val mid = (us.min + us.max) / 2 // non-negative: floor == truncate
      val expected = rows.groupBy(_._3).flatMap { case (t, xs) =>
        val old = xs.filter(_._1 < mid); val nw = xs.filter(_._1 >= mid)
        if (old.isEmpty || nw.isEmpty) None
        else {
          def cents(v: Double) = math.floor(v * 100).toLong
          val vs = xs.map(x => cents(x._2)).distinct.sorted
          val ks = vs.map { v =>
            val co = old.count(x => cents(x._2) <= v).toLong
            val cn = nw.count(x => cents(x._2) <= v).toLong
            math.abs(co * 1000000L / old.length - cn * 1000000L / nw.length)
          }.max
          Some(t -> ((old.length.toLong, nw.length.toLong, ks, ks > 50000L)))
        }
      }
      val got = Validate.ksDriftOf(toDf(rows)).collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
      }.toMap
      assert(got == expected, s"seed=$seed: $got != $expected")
    }
  }

  test("v10 CUSUM equals a driver fold; an injected level shift is located") {
    val dayUs = 86400000000L
    def fold(rows: List[(Long, Double, String)]) = {
      val counts = rows.groupBy(_._1 / dayUs)
        .map { case (d, xs) => d -> xs.length.toLong }.toSeq.sortBy(_._1)
      val (dd, nt) = (counts.length.toLong, counts.map(_._2).sum)
      var cum = 0L
      val curve = counts.zipWithIndex.map { case ((d, n), i) =>
        cum += n
        val c = dd * cum - (i + 1L) * nt
        (d, n, c, math.abs(c) * 1000000L / (dd * nt))
      }
      val mx = curve.map(_._4).max
      val cpDay = curve.filter(_._4 == mx).map(_._1).min
      curve.map { case (d, n, c, st) => d -> ((n, c, st, d == cpDay)) }.toMap
    }
    for (seed <- 80L to 90L) {
      val rows = sample(seed)
      val got = Validate.changepointOf(toDf(rows)).collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
      }.toMap
      assert(got == fold(rows), s"seed=$seed diverged")
    }
    // LOCATION property: 10 quiet days then 10 days at triple volume —
    // the flagged day must be the last pre-shift day (where |CUSUM|
    // peaks for a level shift)
    val shifted = (0 until 200).map { i =>
      val day = if (i < 50) i / 5 else 10 + (i - 50) / 15 // 5/day → 15/day
      (baseUs + day * dayUs + (i % 50) * 1000000L, 1.0, "click")
    }.toList
    val cp = Validate.changepointOf(toDf(shifted)).collect()
      .filter(_.getBoolean(4)).map(_.getLong(0))
    val day0 = baseUs / dayUs
    assert(cp.length == 1 && cp.head == day0 + 9,
      s"shift at day 10 located at ${cp.map(_ - day0).mkString(",")}")
  }
}
