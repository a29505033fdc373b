package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the slow stage of exactDuplicates on the soak corpus. */
object DiagExact {
  def main(args: Array[String]): Unit = {
    val data = args.headOption.getOrElse("/tmp/graft_soak_corpus_1000000")
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-exact")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(data)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("scan only")(docs.count())
    t("trim+lower+md5")(docs.select(md5(lower(trim(col("text")))).as("fp")).groupBy("fp").count().count())
    t("regexp_replace only")(docs.select(regexp_replace(col("text"), " +", " ").as("x")).where(length(col("x")) > 0).count())
    t("fingerprint agg")(Dedup.exactGroups(docs, "doc_id", "text").count())
    t("fingerprint agg 2nd")(Dedup.exactGroups(docs, "doc_id", "text").count())
    t("full exactDuplicates")(Dedup.exactDuplicates(docs, "doc_id", "text").count())
    spark.stop()
  }
}
