package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** The pure-SQL surface of the engine: a `graft(...)` TABLE FUNCTION
  * resolving every registry query, plus temp views for the base tables.
  *
  * The reference's users reach its queries through a served interface
  * (OpenSearch DSL over HTTP — reference `README.md:144-163`,
  * `consumer_to_opensearch.py`); its Spark-native analog is SQL: after
  * registration, `SELECT * FROM graft('q1_terms_count')` runs the same
  * plan the Scala API builds, composable with arbitrary SQL around it
  * (joins, filters, CTEs) — no Scala at the call site.
  *
  *   - `graft(name)` — runs registry query `name` against the session
  *     default corpus (`spark.graft.sfDir` conf).
  *   - `graft(name, sfDir)` — explicit corpus directory.
  *
  * Shape notes:
  *   - The function resolves at ANALYSIS time to the query's own analyzed
  *     logical plan — Catalyst then optimizes the COMPOSED plan, so an
  *     outer `WHERE`/projection prunes into the inner scan exactly as if
  *     the query had been built inline (spec-asserted: an outer filter on
  *     `graft('r1_hash_sample')` reaches the parquet scan).
  *   - Queries that drive iterative fixpoints (d7/d23/x29…) run their
  *     driver loops when the SQL referencing them is ANALYZED — on use,
  *     never at registration.
  *   - Arguments must be literal/foldable strings: the name selects a
  *     plan, so it cannot be row-dependent.
  */
object GraftSql {

  /** Conf key for the session-default corpus directory. */
  val SfDirKey = "spark.graft.sfDir"

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other if other.foldable && other.dataType == StringType &&
        other.eval() != null => other.eval().toString
    case other => throw new IllegalArgumentException(
      s"graft(): $what must be a literal string, got: $other")
  }

  private def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2,
      "graft() takes (name) or (name, sfDir)")
    val name = strArg(args.head, "query name")
    val spark = SparkSession.active
    val sfDir = args.lift(1).map(strArg(_, "sfDir")).getOrElse {
      spark.conf.getOption(SfDirKey).getOrElse(throw new IllegalArgumentException(
        s"graft('$name'): no sfDir — pass graft(name, dir) or set $SfDirKey"))
    }
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"graft('$name'): unknown query; ${graft.SparkEntry.queries.size} " +
          s"registered, e.g. ${graft.SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")}"))
    // the ANALYZED child plan: already resolved, so the outer analyzer
    // composes it as a subquery-like relation and the optimizer sees one
    // seamless tree (filter/projection pushdown crosses the boundary)
    fn(spark, sfDir).queryExecution.analyzed
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("graft"),
      new ExpressionInfo(GraftSql.getClass.getName, null, "graft",
        "graft(name[, sfDir]) - table function running the named graft registry query",
        "", "", "", "", "", "", "built-in"),
      plan _)

  /** Register the table function on a live session (the extension path
    * [[GraftExtensions]] does the same via `injectTableFunction`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(descriptor._1.funcName, descriptor._3,
        "scala_udf")

  /** Temp views for the corpus tables, so pure-SQL users can also compose
    * raw-table SQL with `graft(...)` results. View names are exactly the
    * oracle's table names.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    spark.conf.set(SfDirKey, sfDir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
  }
}
