package graft
import graft.engine.ValidationEngine
import graft.gen.SequenceGen
import graft.spec.SchemaParser
import org.apache.spark.sql.SparkSession
/** compute-validate job timing at one core count (GenTokens effect). */
object DiagGen {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val rows = if (args.length > 1) args(1).toLong else 12000000L
    val parts = if (args.length > 2) args(2).toInt else 0
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = SchemaParser.parse(Main.builtinSpec)
    def t(tag: String)(b: => Unit): Unit = {
      b
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); b; (System.nanoTime()-t0)/1e9 }
      println(f"[diaggen] cpus=$cpus rows=$rows $tag best=${ts.min}%.2f")
    }
    val full = ValidationEngine.annotate(SequenceGen.generate(spark, rows, parts = parts), spec)
      .select("doc_id","valid","violations")
    // how many times does gen_tokens appear in the final codegen source?
    val code = org.apache.spark.sql.execution.debug.codegenString(full.queryExecution.executedPlan)
    println(s"[diaggen] gen_tokens copies in codegen: ${"GenTokens|gen_tokens|hashInt".r.findAllIn(code).size}; hashInt sites: ${"hashInt".r.findAllIn(code).size}")
    t("gen-only")(SequenceGen.generate(spark, rows).write.format("noop").mode("overwrite").save())
    t("gen+validate")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
