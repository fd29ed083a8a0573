package graft

/** Registry-wide smoke: every declared query must build a plan and
  * execute at sf0.001, and every oracle entry must point at a declared
  * query. Catches a broken registry entry without waiting for the
  * external verify harness.
  */
class RegistrySmokeSpec extends SparkSpec {

  test("every registered query executes and returns a schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.schema.nonEmpty, s"$name: empty schema")
        df.count() // execution, not just analysis
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle keys are a subset of query keys; flagship entry is live") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
