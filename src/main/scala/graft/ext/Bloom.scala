package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Portable._

/** Bloom-filter runtime join pruning — the "runtime filter" every
  * large-scale engine applies before an expensive fact-side shuffle
  * (Spark's own AQE injects `BloomFilterAggregate` the same way; here the
  * filter is built from engine-portable exact integers so the DuckDB
  * oracle can verify the registers bit-for-bit, like r7/r8's sketches).
  *
  * Shape and why it scales: the dimension side's join keys are folded
  * into a FIXED-SIZE register table ([[NWords]]×32 bits ≈ 32 KB regardless
  * of corpus size — built with one map-side-combinable `bit_or`
  * aggregation), the fact table tests K bits per row via K codegen'd
  * broadcast hash joins against that table (no shuffle, no row
  * multiplication), and only surviving rows — true matches plus the
  * few-percent false positives — enter the exact semi-join shuffle. At 100 TB the win is
  * that the big shuffle moves ~|matches| rows instead of |fact| rows,
  * while the exact confirm keeps the result identical to the plain semi
  * join (the oracle IS the plain semi join: the bloom is provably
  * invisible in the output).
  *
  * The reference has no joins at all (SURVEY §2.1); this is part of the
  * join surface a replacement engine must bring, sized for its 100 TB
  * deployment (cf. `consumer_to_opensearch.py:94-95` — the reference
  * point-looks-up one key at a time; a bulk backfill of that upsert path
  * is exactly a fact-by-key semi join).
  */
object Bloom {

  type Q = (SparkSession, String) => DataFrame

  /** Hash functions per key (classic k). */
  private val K = 3

  /** 32-bit register words: a shift below 32 stays comfortably inside a
    * signed BIGINT in BOTH engines (DuckDB raises on `1::BIGINT << 63`,
    * so 64-bit words are not portable).
    */
  private val WordBits = 32

  /** Default sketch size: 2^18 bits = 8192 words ≈ 32 KB. At the bench
    * SF (~30k urgent orders) that is kn/m ≈ 0.34 → ~2.5% false-positive
    * rate; a production build sizes m from the dim-side count the same
    * way Spark's AQE does.
    */
  private[ext] val NWords = 8192

  /** TWO hash families, one per purpose:
    *
    *   - The PORTABLE family (b2): Kirsch-Mitzenmacher double hashing
    *     over [[Portable.tokenHash]]'s md5 — one digest split into two
    *     32-hex-bit halves h1/h2, position_i = (h1 + i·h2) mod m. Both
    *     engines compute it bit-identically, which is what lets the
    *     DuckDB oracle verify the REGISTERS — the proof that the sketch
    *     is a well-defined, mergeable data structure, not engine trivia.
    *   - The FAST family (b1): `xxhash64(i, key)` — Spark's native
    *     codegen'd hash, ~two orders of magnitude cheaper per row than
    *     an md5-hex-conv chain. The runtime filter never leaves the
    *     engine (b1's oracle is the plain semi join — the bloom is
    *     invisible in the result), so nothing about it needs to be
    *     portable, and the fact-side scan should pay native-hash cost,
    *     exactly as Spark's own AQE runtime filters do.
    */
  private def portablePositions(df: DataFrame, key: Column, nWords: Int): DataFrame = {
    val m = nWords.toLong * WordBits
    df.withColumn("__bmd5", md5(concat(lit("bf:"), key.cast("string"))))
      .withColumn("__bh1",
        conv(substring(col("__bmd5"), 1, 8), 16, 10).cast("long") % P)
      .withColumn("__bh2",
        conv(substring(col("__bmd5"), 9, 8), 16, 10).cast("long") % P)
      .withColumns((0 until K).map(i =>
        s"__p$i" -> ((col("__bh1") + lit(i.toLong) * col("__bh2")) % m)).toMap)
  }

  private def fastPos(i: Int, key: Column, nWords: Int): Column =
    pmod(xxhash64(lit(i), key), lit(nWords.toLong * WordBits))

  private def hashPosSql(i: Int, key: String, nWords: Int): String = {
    val h1 = s"(CAST('0x' || substring(md5('bf:' || CAST($key AS VARCHAR)), 1, 8) AS BIGINT) % $P)"
    val h2 = s"(CAST('0x' || substring(md5('bf:' || CAST($key AS VARCHAR)), 9, 8) AS BIGINT) % $P)"
    s"(($h1 + $i * $h2) % ${nWords.toLong * WordBits})"
  }

  /** The filtered dimension side: urgent orders' keys. */
  private def urgentKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))

  /** Positions → `(w, mask)` register words, one row per touched word.
    * `bit_or` partial-aggregates map-side, so the full pass over the
    * dimension reduces to ≤ `nWords` rows before any shuffle.
    */
  private def wordsOf(positions: DataFrame): DataFrame =
    positions
      .select(expr(s"p DIV $WordBits").as("w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $WordBits AS INT))").as("m"))
      .groupBy("w")
      .agg(expr("bit_or(m)").as("mask"))

  /** Portable-family registers (b2's query shape). */
  private[ext] def bloomWords(keys: DataFrame, keyCol: String,
      nWords: Int = NWords): DataFrame =
    wordsOf(portablePositions(keys, col(keyCol), nWords)
      .select(explode(array((0 until K).map(i => col(s"__p$i")): _*)).as("p")))

  /** Fast-family registers — the build side of [[prunedCandidates]]. */
  private[ext] def bloomWordsFast(keys: DataFrame, keyCol: String,
      nWords: Int = NWords): DataFrame =
    wordsOf(keys.select(explode(array((0 until K).map(i =>
      fastPos(i, col(keyCol), nWords)): _*)).as("p")))

  /** Fact rows surviving the bloom test — a SUPERSET of the true matches
    * (a bloom filter has no false negatives; `BloomSpec` asserts it).
    *
    * The K bit tests are K BroadcastHashJoins against the (≤ nWords)-row
    * register table: equi-key = the word index, residual condition = the
    * bit mask test. An inner join doubles as the test — a key whose word
    * was never touched has no row to match (bit trivially 0), and an
    * unset bit fails the residual. Everything — the K hash projections
    * and all K joins — stays inside whole-stage codegen on the fact
    * side with ZERO exchanges. (A first cut carried the sketch as one
    * array row through a BroadcastNestedLoopJoin; BNLJ conditions are
    * INTERPRETED, so the md5 chain ran un-codegen'd per row — 50 s at
    * sf0.1 where this shape takes well under a second.)
    */
  // -- shared pieces of the two fact-side bit-test shapes (b1's inner
  //    prune and b3's flagging left joins): ONE definition of the hash
  //    positions and the bit test, so a K/WordBits/hash change can never
  //    silently diverge the sketches
  private def withPositions(fact: DataFrame, keyCol: String,
      nWords: Int): DataFrame =
    (0 until K).foldLeft(fact) { (df, i) =>
      df.withColumn(s"__p$i", fastPos(i, col(keyCol), nWords))
    }

  private def wordFor(words: DataFrame, i: Int): DataFrame =
    broadcast(words.select(col("w").as(s"__w$i"), col("mask").as(s"__m$i")))

  private def bitSet(i: Int): Column =
    col(s"__m$i").bitwiseAND(
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__p$i % $WordBits AS INT))")) =!= 0L

  private def dropAux(df: DataFrame): DataFrame =
    df.drop((0 until K).flatMap(i => Seq(s"__p$i", s"__w$i", s"__m$i")): _*)

  private[ext] def prunedCandidates(fact: DataFrame, keyCol: String,
      words: DataFrame, nWords: Int): DataFrame =
    dropAux((0 until K).foldLeft(withPositions(fact, keyCol, nWords)) { (df, i) =>
      // INNER join: rows shed at every stage, so the miss-heavy fact
      // stream shrinks progressively — the right shape when only the
      // candidates are wanted
      df.join(wordFor(words, i),
        expr(s"__p$i DIV $WordBits") === col(s"__w$i") && bitSet(i))
    })

  /** b1 — bloom-pruned semi-join revenue: lineitem revenue restricted to
    * urgent orders, pruned by the sketch BEFORE the exact semi join.
    * Result ≡ the plain semi join (the oracle), by construction.
    */
  def bloomPrunedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = urgentKeys(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
    // the register table feeds K broadcasts — materialize it once
    // instead of re-running the dimension scan + aggregation per join
    val candidates = prunedCandidates(li, "l_orderkey",
      bloomWordsFast(keys, "o_orderkey", NWords).localCheckpoint(false), NWords)
    // keys is fact-sized at 100 TB — shuffle semi join, never broadcast.
    // BARRIER between prune and confirm: without it, Catalyst's
    // PushDownLeftSemiAntiJoin reorders the exact semi join BELOW the
    // bloom joins (it pushes semi joins toward the scan through inner
    // joins), which silently inverts the whole design — the expensive
    // confirm would run on the unpruned fact table and the bloom would
    // filter rows the semi join already answered. The non-deterministic
    // barrier column is unpushable, so the optimizer must keep
    // prune-then-confirm — the order that matters when the confirm is a
    // 100 TB shuffle rather than this local broadcast.
    barrierFilter(candidates, lit(true))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** b2 — the registers themselves, oracle-checked bit-for-bit: like
    * r7/r8, the sketch CONTENT is exact integers both engines compute
    * identically, so the correctness gate covers the data structure, not
    * just its end effect.
    */
  def bloomRegisters(spark: SparkSession, sfDir: String): DataFrame =
    bloomWords(urgentKeys(spark, sfDir), "o_orderkey")

  /** Fact rows annotated with the bloom verdict (`__maybe`): K LEFT
    * broadcast joins against the register table, a missing word row or
    * an unset bit meaning "definitely not a member". Same codegen
    * properties as [[prunedCandidates]], but keeps BOTH populations.
    */
  private def bloomFlagged(fact: DataFrame, keyCol: String,
      words: DataFrame, nWords: Int): DataFrame = {
    // LEFT joins (vs prunedCandidates' inner): every row keeps flowing,
    // a missing word row meaning "bit trivially 0" via the coalesce —
    // the shape when BOTH populations are wanted
    val joined = (0 until K).foldLeft(withPositions(fact, keyCol, nWords)) {
      (df, i) =>
        df.join(wordFor(words, i),
          expr(s"__p$i DIV $WordBits") === col(s"__w$i"), "left")
    }
    dropAux(joined.withColumn("__maybe",
      (0 until K).map(i => coalesce(bitSet(i), lit(false))).reduce(_ && _)))
  }

  /** b3 — bloom-accelerated ANTI join: revenue over lineitems whose
    * order is NOT urgent. A bloom filter has no false negatives, so a
    * fact row whose key FAILS the bit test is PROVABLY a non-member and
    * bypasses the anti join entirely — it flows map-only into the
    * aggregate. Only the bloom HITS (true members + the ~2% false
    * positives) pay the exact anti-join shuffle. At 100 TB the anti
    * join moves ~|members| rows instead of |fact| rows; the price is a
    * second column-pruned scan for the two populations (scanning twice
    * beats shuffling once at fact scale, and a side-output-capable
    * engine would fuse even that). The barrier pins prune-then-confirm
    * exactly as in b1 — `PushDownLeftSemiAntiJoin` would otherwise
    * anti-join the UNPRUNED fact below the flag joins. Result ≡ the
    * plain anti join (the oracle); `BloomSpec` additionally asserts the
    * miss population contains zero true members.
    */
  def bloomAntiRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = urgentKeys(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
    val words = bloomWordsFast(keys, "o_orderkey", NWords).localCheckpoint(false)
    val flagged = bloomFlagged(li, "l_orderkey", words, NWords)
    val misses = flagged.filter(!col("__maybe")).drop("__maybe")
    val hits = barrierFilter(flagged.filter(col("__maybe")).drop("__maybe"),
        lit(true))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_anti")
    misses.unionByName(hits)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val queries: Map[String, Q] = Map(
    "b1_bloom_prune" -> (bloomPrunedRevenue _),
    "b2_bloom_registers" -> (bloomRegisters _),
    "b3_bloom_anti" -> (bloomAntiRevenue _)
  )

  val oracle: Map[String, String] = Map(
    // the bloom split is invisible: plain anti join
    "b3_bloom_anti" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,
    // the bloom is invisible: plain semi join
    "b1_bloom_prune" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,
    "b2_bloom_registers" -> {
      val hs = (0 until K)
        .map(i => hashPosSql(i, "o_orderkey", NWords))
        .mkString("[", ", ", "]")
      s"""SELECT p // $WordBits AS w,
         |  bit_or(CAST(1 AS BIGINT) << CAST(p % $WordBits AS INTEGER)) AS mask
         |FROM (
         |  SELECT unnest($hs) AS p
         |  FROM orders WHERE o_orderpriority = '1-URGENT')
         |GROUP BY w""".stripMargin
    }
  )
}
