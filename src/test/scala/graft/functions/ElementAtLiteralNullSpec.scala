package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins the codegen pitfall the c22 bigram rewrite hit: `element_at`
  * over a LITERAL array of non-nullable elements reports
  * `nullable=false`, so generated code ignores a nullable index's null
  * flag and reads an arbitrary in-table (or default) value instead of
  * propagating null. Any lookup whose index can be null (e.g. a window
  * `lead` past the partition end) must guard with
  * `when(idx.isNotNull, element_at(...))` — relying on null propagation
  * through the arithmetic chain silently returns garbage.
  */
class ElementAtLiteralNullSpec extends graft.SparkSpec {
  test("nullable lead index into element_at(typedLit) needs an explicit guard") {
    import spark.implicits._
    val df = Seq((1L, 0, 5L), (1L, 1, 7L)).toDF("doc_id", "pos", "h")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val nxt = lead("h", 1).over(w)
    val idx = (((col("h") * 31L + nxt) % 3L) + 1L).cast("int")
    val table = typedLit(Seq(10L, 20L, 30L))
    val out = df.select(
      element_at(table, idx).as("unguarded"),
      when(nxt.isNotNull, element_at(table, idx)).as("guarded"))
    // guarded: exactly one non-null (the non-terminal row)
    assert(out.agg(count(col("guarded"))).head.getLong(0) == 1L)
    // unguarded: the null index does NOT propagate — both rows non-null.
    // If Spark ever fixes ElementAt's nullability this assert flips and
    // tells us the `when` guards can come off.
    assert(out.agg(count(col("unguarded"))).head.getLong(0) == 2L)
  }
}
