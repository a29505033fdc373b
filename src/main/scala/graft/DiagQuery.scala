package graft

import org.apache.spark.sql.SparkSession

/** Time one named SparkEntry query in isolation: warmup + N repetitions,
  * min/median printed — for chasing per-query bench outliers without
  * rerunning the whole Bench suite.
  * Usage: DiagQuery <queryName> [sfDir] [reps]
  */
object DiagQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .appName(s"diag-$name")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, dir).explain("formatted")
    fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[diagq] $name reps=$reps min=${times.head}%.3f med=${times(reps / 2)}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
