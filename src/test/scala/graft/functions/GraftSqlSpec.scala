package graft.functions

import graft.SparkSpec

/** The pure-SQL surface: `graft(name[, sfDir])` must return exactly what
  * the Scala API returns (same plan → same rows), compose with outer SQL,
  * and keep Catalyst's pushdown working across the function boundary.
  */
class GraftSqlSpec extends SparkSpec {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("graft() table function matches the Scala API row for row") {
    GraftSql.register(spark)
    GraftSql.registerTables(spark, sf) // also sets spark.graft.sfDir
    for (name <- Seq("q1_terms_count", "q3_recent_topk", "t3_top_customers",
        "d3_minhash_lsh")) {
      val viaSql = spark.sql(s"SELECT * FROM graft('$name')")
      val direct = graft.SparkEntry.queries(name)(spark, sf)
      assert(viaSql.columns.toSeq == direct.columns.toSeq, name)
      assert(canon(viaSql.collect()) == canon(direct.collect()), name)
    }
  }

  test("graft() composes with outer SQL and explicit sfDir") {
    GraftSql.register(spark)
    spark.conf.set(GraftSql.SfDirKey, sf)
    // outer aggregation over a graft() relation, explicit-dir form
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft('r1_hash_sample', '$sf') WHERE lang = 'en'")
      .collect().head.getLong(0)
    val direct = graft.SparkEntry.queries("r1_hash_sample")(spark, sf)
      .filter("lang = 'en'").count()
    assert(n == direct && n > 0)
    // joinable against a registered base-table view
    GraftSql.registerTables(spark, sf)
    val j = spark.sql(
      """SELECT count(*) AS n FROM graft('r1_hash_sample') g
        |JOIN documents d ON g.doc_id = d.doc_id""".stripMargin)
      .collect().head.getLong(0)
    assert(j == direct + graft.SparkEntry.queries("r1_hash_sample")(spark, sf)
      .filter("lang <> 'en'").count())
  }

  test("outer predicates prune through the graft() boundary to the scan") {
    GraftSql.register(spark)
    spark.conf.set(GraftSql.SfDirKey, sf)
    val plan = spark.sql(
      "SELECT doc_id FROM graft('r1_hash_sample') WHERE lang = 'en'")
      .queryExecution.executedPlan.toString
    // the analyzed child must not be an optimization barrier: the outer
    // lang filter has to reach the parquet scan as a pushed filter
    assert(plan.contains("PushedFilters: [") && plan.contains("lang"),
      s"outer filter did not push into the scan:\n$plan")
  }

  test("graft() fails loudly on unknown names and missing sfDir") {
    GraftSql.register(spark)
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft('no_such_query', '$sf')").collect()
    }
    assert(e1.getMessage.contains("unknown query"), e1.getMessage)
    val prev = spark.conf.getOption(GraftSql.SfDirKey)
    spark.conf.unset(GraftSql.SfDirKey)
    try {
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM graft('q1_terms_count')").collect()
      }
      assert(e2.getMessage.contains("no sfDir"), e2.getMessage)
    } finally prev.foreach(spark.conf.set(GraftSql.SfDirKey, _))
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft(doc_id) ").collect()
    }
    assert(e3.getMessage.contains("literal string") ||
      e3.getMessage.contains("UNRESOLVED"), e3.getMessage)
  }

  test("the session-extension class injects the table function") {
    val ext = new GraftExtensions()
    assert(GraftSql.descriptor._1.funcName == "graft")
    assert(ext != null)
  }
}
