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
    * Spark plan and the oracle SQL share them verbatim. The first 16 of
    * each are LCG draws 0–15 (A) and 16–31 (B) — unchanged since round 4
    * so every 16-perm consumer (d8's estimator) keeps byte-identical
    * sketches; the r13 extension to 64 permutations (the d3 chain's 8×8
    * banding) appends draws 32–79 (A) and 80–127 (B) of the same stream.
    */
  val A: Seq[Long] = Seq(
    1250496048L, 1310387594L, 1622543901L, 519131292L, 937264594L,
    926495101L, 276623842L, 371918760L, 737924297L, 673123932L, 392119119L,
    607027384L, 1810676232L, 908017769L, 653546276L, 221837972L, 371610716L,
    1116728088L, 1068289595L, 1623482468L, 739071695L, 467549713L,
    1963054037L, 137395201L, 1885903266L, 1785215716L, 928547746L,
    378030560L, 761135805L, 677050190L, 254146421L, 634843830L, 481215142L,
    920179623L, 556287185L, 1053621443L, 1415748908L, 1631933444L,
    993138030L, 374995119L, 1072346595L, 734331512L, 552642595L,
    1488039668L, 1497475623L, 836052351L, 33770133L, 1634148828L,
    594536781L, 1082111822L, 364103833L, 254288546L, 565848104L,
    1556365893L, 1103810478L, 1057262798L, 227334422L, 857200385L,
    716197123L, 1305054842L, 1552933878L, 915254533L, 401659851L, 295391350L)
  val B: Seq[Long] = Seq(
    1725916345L, 1925268155L, 288915710L, 1470750676L, 881535395L,
    2013439802L, 916215417L, 428859123L, 1749340445L, 738626585L,
    141491485L, 237254901L, 1485399080L, 1534260451L, 807382294L,
    838351608L, 200641629L, 459571778L, 1486568634L, 1711133357L,
    1450869245L, 417517426L, 616364851L, 139694423L, 107932273L, 274512615L,
    1988138740L, 341553738L, 1427095701L, 2018926065L, 614590687L,
    1009861203L, 558824530L, 1242321371L, 1486798454L, 208479498L,
    1105243836L, 86640364L, 1244684901L, 970087806L, 574147375L, 117891388L,
    177389592L, 1728196984L, 1992328177L, 848791909L, 964676455L, 26814280L,
    45095351L, 683441216L, 881552151L, 533200705L, 1971878236L, 363022629L,
    2039221237L, 523852472L, 929783932L, 142635026L, 85969071L, 111806707L,
    1199486294L, 1198831035L, 711623538L, 895398211L)

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
