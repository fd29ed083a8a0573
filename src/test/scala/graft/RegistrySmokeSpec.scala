package graft

/** Registry-wide smoke: every declared query must build a plan and
  * execute at sf0.001, and every oracle entry must point at a declared
  * query. Catches a broken registry entry without waiting for the
  * external verify harness.
  */
class RegistrySmokeSpec extends SparkSpec {

  // Queries allowed to return 0 rows at sf0.001 ONLY. Each entry must
  // name the larger SF where it is provably non-vacuous — enforced by the
  // dedicated test below, so an allowlisted query cannot rot into
  // empty-vs-empty at the driver's verify SF either.
  private val emptyAtTestSf: Map[String, String] = Map(
    // two-nation shipping filter matches nothing in the 60-customer
    // sample; 14 rows at the driver's sf0.01 (CORRECTNESS_r06)
    "t9_volume_shipping" -> "/root/testdata/sf0.01",
    // relational division: at sf0.001 no user covers every distinct
    // day; 3 qualifying users at the driver's sf0.01
    "u5_division" -> "/root/testdata/sf0.01"
  )

  test("every registered query executes, returns a schema, and is NON-VACUOUS") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.schema.nonEmpty, s"$name: empty schema")
        val n = df.count() // execution, not just analysis
        // an empty result makes the oracle hash-match vacuous (empty
        // always equals empty — o22 passed two rounds that way), so >0
        // rows is part of the contract unless explicitly allowlisted
        if (n == 0 && !emptyAtTestSf.contains(name))
          Some(s"$name: 0 rows at test SF (vacuous oracle comparison)")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("allowlisted-empty queries are non-vacuous at their declared SF") {
    for ((name, sfDir) <- emptyAtTestSf) {
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name: vacuous even at $sfDir")
    }
  }

  test("no cross-module key collisions — Map ++ would shadow silently") {
    // SparkEntry.queries is a ++ union of fifteen module maps; a key
    // declared twice (e.g. a new module reusing an old number) would
    // silently drop one implementation and the oracle comparison would
    // test the WRONG query under the right name. Guard the invariant
    // that the union is collision-free, module by module.
    val modules: Seq[(String, Map[String, _])] = Seq(
      "cdc" -> cdc.CdcQueries.queries, "dashboards" -> analytics.Dashboards.queries,
      "tpch" -> ext.Tpch.queries, "dedup" -> ext.Dedup.queries,
      "similarity" -> ext.Similarity.queries, "text" -> ext.TextAnalysis.queries,
      "multimodal" -> ext.Multimodal.queries, "sessions" -> ext.Sessions.queries,
      "sampling" -> ext.Sampling.queries, "pipeline" -> ext.Pipeline.queries,
      "temporal" -> ext.Temporal.queries, "prep" -> ext.Prep.queries,
      "relational" -> ext.Relational.queries, "search" -> ext.Search.queries,
      "bloom" -> ext.Bloom.queries, "validate" -> ext.Validate.queries)
    val owners = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.length > 1)
    assert(owners.isEmpty,
      s"key(s) declared in multiple modules: " +
        owners.map { case (k, ms) => s"$k(${ms.map(_._2).mkString("+")})" }.mkString(", "))
    assert(modules.map(_._2.size).sum == SparkEntry.queries.size,
      "union size diverges from module sizes — a key was shadowed")
  }

  test("oracle keys are a subset of query keys; flagship entry is live") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
