package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Results are forced with
  * the `noop` sink so the full plan executes (a bare count() would let
  * Catalyst prune the projections being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Per-query warmup + min-of-3 (the ScalingBench discipline): one
    // untimed run absorbs JIT/classload/parquet-footer costs, then the
    // min of three timed runs measures the PLAN. Noise in this sandbox
    // is one-sided (cgroup page-charge stalls and co-tenant bursts that
    // outlast a two-rep window — measured: ann_ivf_topk 1.08 s quiet vs
    // 3.3 s min-of-2 under a burst), so min over a wider window is the
    // right estimator.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try {
        def run(): Unit = fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        run() // warmup
        (1 to reps).map(_ => time(run())).min
      } catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // headline: validated sequences/sec on the primary input shape
    // (production output shape: key + verdict + violations; min of
    // `reps` timed runs after one warmup, matching ScalingBench
    // methodology)
    val seqRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "2000000").toLong
    val spec = spec_.docIndependentSpec
    def seqJob(): Unit =
      engine.ValidationEngine.annotate(gen.SequenceGen.generate(spark, seqRows), spec)
        .select("doc_id", "valid", "violations")
        .write.format("noop").mode("overwrite").save()
    seqJob() // warmup
    val vSec = (1 to reps).map(_ => time(seqJob())).min
    val seqThroughput = seqRows / vSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","seq_validation":{"rows":$seqRows,"sec":${f"$vSec%.3f"},"rows_per_sec":${f"$seqThroughput%.0f"},"cpus":$cpus}}""")
    spark.stop()
  }

  /** Shared spec instance for bench/scaling mains. */
  private object spec_ {
    lazy val docIndependentSpec: graft.spec.SchemaSpec =
      graft.spec.SchemaParser.parse(Main.builtinSpec)
  }
}
