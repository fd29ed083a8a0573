package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash primitives computed identically by Spark and the DuckDB oracle.
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB
  * running [[graft.SparkEntry.oracleSql]] on the same parquet — so every
  * hash-derived value (MinHash signatures, SimHash bits, fingerprints,
  * LSH bucket keys) must be bit-identical across both engines. Neither
  * engine's native hash matches the other (Spark = Murmur3/xxhash64,
  * DuckDB = its own), so we build one from a primitive both agree on:
  * `md5` hex. `H(t) = int(md5(t)[0,8)) mod P` — the Spark side via
  * `conv(hex,16,10)`, the DuckDB side via a `'0x…'` cast, verified equal.
  *
  * All derived hashes stay below 2^62 (`a*h < P^2 < 2^62`), so 64-bit
  * arithmetic never overflows in either engine.
  */
object Portable {

  /** Modulus: 2^31-1 (Mersenne prime). */
  val P = 2147483647L

  /** Affine MinHash family h_i(x) = (A(i)*x + B(i)) mod P. Constants from
    * the LCG x←(1103515245x+12345) mod P seeded at 42 — fixed here so the
    * Spark plan and the oracle SQL share them verbatim.
    */
  val A: Seq[Long] = Seq(1250496048L, 1310387594L, 1622543901L, 519131292L,
    937264594L, 926495101L, 276623842L, 371918760L, 737924297L, 673123932L,
    392119119L, 607027384L, 1810676232L, 908017769L, 653546276L, 221837972L)
  val B: Seq[Long] = Seq(1725916345L, 1925268155L, 288915710L, 1470750676L,
    881535395L, 2013439802L, 916215417L, 428859123L, 1749340445L, 738626585L,
    141491485L, 237254901L, 1485399080L, 1534260451L, 807382294L, 838351608L)

  /** H(t) for a string column — Spark side. */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % P

  /** H(t) — DuckDB side, over SQL expression `t`. */
  def tokenHashSql(t: String): String =
    s"(CAST('0x' || substring(md5($t), 1, 8) AS BIGINT) % $P)"

  /** H(t) — JVM side, same formula (specs cross-check engine tokens). */
  def tokenHashOf(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % P
  }

  /** h_i(x) over an already-hashed long — both sides share the formula. */
  def affine(i: Int, h: Column): Column = (lit(A(i)) * h + B(i)) % P
  def affineSql(i: Int, h: String): String = s"((${A(i)} * $h + ${B(i)}) % $P)"

  /** Ordered polynomial fold `acc ← (acc*31 + x) mod P` of a long array —
    * the band-key / fingerprint combiner. Spark `aggregate` with init 0
    * equals DuckDB `list_reduce` with 0 prepended.
    */
  def fold31(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => (acc * 31L + x) % P)
  def fold31Sql(arr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $arr), (a, b) -> (a * 31 + b) % $P)"

  /** Whitespace tokens, duplicates kept (order-preserving). */
  def tokens(text: Column): Column = split(text, " ")
  def tokensSql(text: String): String = s"string_split($text, ' ')"

  /** Similarity-threshold filter that is guaranteed to evaluate ABOVE the
    * projection producing `df` — an optimizer barrier.
    *
    * Without it, Catalyst pushes the threshold predicate through the
    * scoring projection and into the pair-join condition, substituting the
    * full scoring expression back in; a Jaccard filter then evaluates
    * `array_intersect` up to 4× per candidate pair (join condition twice +
    * output projection twice). Referencing a non-deterministic column in
    * the predicate makes it unpushable, so the score computes once in the
    * projection (codegen CSE) and the filter reads the scalar.
    */
  def barrierFilter(df: org.apache.spark.sql.DataFrame, cond: Column): org.apache.spark.sql.DataFrame =
    df.withColumn("__barrier", monotonically_increasing_id())
      .filter(cond && col("__barrier") >= 0L)
      .drop("__barrier")

  /** Distinct token set. DuckDB's `list_distinct` does NOT preserve
    * element order (Spark's `array_distinct` does), so everything built on
    * the set must be order-insensitive: min, sum, intersection sizes.
    */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))
  def tokenSetSql(text: String): String = s"list_distinct(string_split($text, ' '))"
}
