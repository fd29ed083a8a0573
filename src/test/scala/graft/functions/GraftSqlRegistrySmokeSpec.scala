package graft.functions

import graft.SparkSpec

/** Registry-wide smoke of the SQL surface: EVERY registered query must
  * resolve through `SELECT ... FROM graft(name)` and return the same
  * row count as the Scala API at sf0.001. GraftSqlSpec proves deep
  * equivalence (rows, composition, pushdown) on a sample; this spec
  * proves BREADTH — a query whose driver loop or session assumptions
  * misbehave under analysis-time invocation (graft() resolves the plan
  * while the outer statement is being analyzed) would otherwise be
  * invisible until a user hit it from SQL. Counts only, smallest SF:
  * the point is resolution + execution parity, not value equality,
  * which the per-query oracle gate already covers.
  */
class GraftSqlRegistrySmokeSpec extends SparkSpec {

  test("every registry key resolves and count-matches the Scala API via graft()") {
    GraftSql.register(spark)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    assert(names.size > 200) // the whole registry, not a sample
    val mismatches = names.flatMap { name =>
      val direct = graft.SparkEntry.queries(name)(spark, sf).count()
      val viaSql = spark.sql(
        s"SELECT count(*) AS n FROM graft('$name', '$sf')")
        .collect().head.getLong(0)
      if (viaSql == direct) None
      else Some(s"$name: sql=$viaSql scala=$direct")
    }
    assert(mismatches.isEmpty, mismatches.mkString("; "))
  }
}
