package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** File-format round-trips beyond parquet: CSV and JSON-lines with an
  * EXPLICIT schema on read (schema inference is a full extra pass over
  * the data at 100 TB — the engine's contract is declared schemas).
  */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def docs = graft.Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars")

  test("csv round-trips under a declared schema (no inference pass)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema == schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).first.getLong(0) ==
      docs.agg(sum("n_chars")).first.getLong(0))
  }

  test("orc round-trips and keeps pushdown + pruning") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Layout.writeOrc(docs, dir)
    val back = Layout.readOrc(spark, dir)
    val a = back.orderBy("doc_id").collect().map(_.toSeq)
    val b = docs.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
    // the columnar virtues survive the format change: the filter reaches
    // the ORC scan as a pushed predicate and only referenced columns load
    val plan = back.filter(col("doc_id") < 100).select("lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), plan)
  }

  test("json-lines round-trips under a declared schema") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == docs.count())
    val a = back.orderBy("doc_id").collect().map(_.toSeq)
    val b = docs.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
