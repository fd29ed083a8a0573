package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("native functions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       sorted_intersect_count(array(1L, 3L, 5L), array(2L, 3L, 5L, 9L)) AS s""".stripMargin)
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getDouble(1) == 11.0)
    assert(row.getLong(2) == 2L)
  }

  test("SQL function matches the Column API bit for bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(20)
    e.createOrReplaceTempView("gf_e")
    val viaSql = spark.sql(
      """SELECT a.vec_id i, b.vec_id j, cosine_sim(a.v, b.v) c
        |FROM gf_e a JOIN gf_e b ON a.vec_id < b.vec_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaCol = e.alias("a").join(e.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        CosineSimilarity.cosineSim(col("a.v"), col("b.v")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaSql == viaCol)
  }

  test("the session-extension entry point wires the same functions") {
    // The extension class itself must be instantiable and complete (the
    // config path `spark.sql.extensions` constructs it reflectively).
    val ext = new GraftExtensions()
    assert(GraftFunctions.descriptors.map(_._1.funcName).toSet ==
      Set("cosine_sim", "dot_product", "sorted_intersect_count"))
    assert(ext != null)
  }
}
