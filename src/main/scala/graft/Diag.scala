package graft
import graft.engine.ValidationEngine
import graft.spec.SchemaParser
import org.apache.spark.sql.SparkSession
/** Scratch perf diagnostics: per-core-count steady-state timings. */
object Diag {
  def main(args: Array[String]): Unit = {
    val data = if (args.length > 1) args(1) else "/tmp/graft_scale_4000000"
    val cpus = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = SchemaParser.parse(Main.builtinSpec)
    val df = spark.read.parquet(data)
    def best(tag: String, n: Int)(b: => Unit): Unit = {
      b // warmup
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); b; (System.nanoTime()-t0)/1e9
      }
      println(f"[diag] cpus=$cpus $tag: best=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    val ann = ValidationEngine.annotate(df, spec)
    best("scan", 3)(df.write.format("noop").mode("overwrite").save())
    best("validate", 3)(ann.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
