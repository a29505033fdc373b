package graft
import graft.engine.ValidationEngine
import graft.spec.SchemaParser
import org.apache.spark.sql.SparkSession
/** Scan-path diagnostics: vectorized nested parquet reader on/off. */
object DiagScan {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val data = if (args.length > 1) args(1) else "/tmp/graft_scale_12000000"
    def run(nested: Boolean): Unit = {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", nested.toString)
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.hadoop.fs.file.impl.disable.cache", "true")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val spec = SchemaParser.parse(Main.builtinSpec)
      val df = spark.read.parquet(data)
      def job(): Unit = ValidationEngine.annotate(df, spec)
        .select("doc_id","valid","violations").write.format("noop").mode("overwrite").save()
      job()
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); job(); (System.nanoTime()-t0)/1e9 }
      println(f"[diagscan] cpus=$cpus nestedVec=$nested best=${ts.min}%.2f all=${ts.map(t=>f"$t%.1f").mkString(",")}")
      spark.stop()
    }
    run(false); run(true)
  }
}
