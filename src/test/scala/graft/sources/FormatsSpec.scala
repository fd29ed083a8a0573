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
