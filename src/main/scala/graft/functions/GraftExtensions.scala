package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, two ways in:
  *
  *   - session extension (config-driven, no code changes at the caller):
  *     `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - explicit on a live session: `GraftFunctions.register(spark)`
  *
  * Either way, `SELECT cosine_sim(a, b)`, `dot_product(a, b)` become
  * available to pure-SQL users with the same codegen'd implementations
  * the Column API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // the `graft(name[, sfDir])` table function — the pure-SQL entry
    // point to the whole registry (see GraftSql)
    ext.injectTableFunction(GraftSql.descriptor)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("cosine_sim"),
        info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
        { args: Seq[Expression] =>
          require(args.length == 2, "cosine_sim takes exactly 2 arguments")
          CosineSimilarity(args(0), args(1))
        }),
      (FunctionIdentifier("dot_product"),
        info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
        { args: Seq[Expression] =>
          require(args.length == 2, "dot_product takes exactly 2 arguments")
          DotProduct(args(0), args(1))
        }),
      (FunctionIdentifier("sorted_intersect_count"),
        info("sorted_intersect_count",
          "sorted_intersect_count(a, b) - intersection size of two sorted array<bigint>"),
        { args: Seq[Expression] =>
          require(args.length == 2, "sorted_intersect_count takes exactly 2 arguments")
          SortedIntersectCount(args(0), args(1))
        })
    )

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
