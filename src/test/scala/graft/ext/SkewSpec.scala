package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the adaptive complement to k3's explicit
  * salting: a hot key's shuffle partition is split at runtime into
  * multiple tasks once its size crosses the skew threshold. At 100 TB
  * this is the mechanism that saves a join nobody pre-salted.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // thresholds small enough that the hot key's partition counts as
    // skewed at test scale
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // 200k rows on ONE key, 100 rows spread over the rest
    val skewed = s.range(0, 200000).select(lit(7L).as("k"), col("id").as("payload"))
      .unionAll(s.range(0, 100).select((col("id") % 50 + 100).as("k"), col("id").as("payload")))
    val dim = s.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("v"))
    val joined = skewed.join(dim, "k")
    // collect() (not count(), which clones the plan) so the SAME
    // queryExecution carries the final adaptive plan
    val n = joined.collect().length
    assert(n == 200000 + 100, s"join lost rows: $n")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the skewed join (plan after execution):\n$plan")
  }
}
