package graft.engine

import graft.SparkSessionTestWrapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** North-star clause "AQE skew handling": when a non-broadcastable join
  * lands on the skewed key distribution the generator deliberately
  * produces (one hot source holds ~half the corpus), AQE's runtime
  * skew-join rule must SPLIT the oversized partition instead of letting
  * one task process it alone. The engine's own joins avoid this path
  * (dimensions broadcast), so this is the safety net for the joins a
  * user writes against the table.
  */
class AqeSkewSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("AQE splits the skewed join partition at runtime (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // scale the skew thresholds down to test-sized data (defaults
      // are 256 MB-class); the RULE under test is the same one that
      // fires at production sizes
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")

      // ~90% of fact rows share one key — the src0-style hot slice
      val fact = spark.range(60000).select(
        when(col("id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("k"), col("id"))).as("k"),
        col("id").as("v"))
      val dim = spark.range(2000).select(
        concat(lit("k"), col("id")).as("k"), lit("hot").as("alt"))
        .union(Seq(("hot", "x")).toDF("k", "alt"))

      val joined = fact.join(dim, Seq("k"))
      // collect() executes THIS DataFrame's own QueryExecution (count()
      // would plan a different query and leave this one unexecuted)
      val rows = joined.collect()
      // 54000 hot matches + cold keys k9,k19,…,k1999 present in dim (200)
      assert(rows.length == 54200)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed SMJ partition split; final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
