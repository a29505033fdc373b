package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Round-6 bisect of the dedup_jaccard_pairs cost: times each pipeline
  * prefix (inverted index explode, bucket collect, pair explode, final
  * aggregation) and kernel-eval variants, to locate where the ~1.5 s at
  * sf0.1 goes. Measurement only.
  */
object DiagJaccard {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-jaccard")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[diagjac] $name%-24s min=${ts.head}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def inv = df
      .select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s0"))
      .select(col("id"), col("n_sh"), xxhash64(col("s0")).as("s"))

    time("kernel_only")(df.select(Dedup.shingles(col("text")).as("sh")))
    time("inv_explode")(inv)
    time("buckets_agg")(inv.groupBy(col("s"))
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("docs")))
    time("buckets_count_agg")(inv.groupBy(col("s")).agg(count(lit(1)).as("c")))
    time("full_op")(Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.1))

    def buckets = inv.groupBy(col("s"))
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("docs"))
    time("buckets_filter")(buckets.where(size(col("docs")).between(2, 2000)))
    time("buckets_observe_filter")(
      buckets.observe("diag_jac_cap",
          count(lit(1)).as("n_buckets"),
          sum(when(size(col("docs")) > 2000, 1L).otherwise(0L)).as("n_dropped"))
        .where(size(col("docs")).between(2, 2000)))
    def pairsOf(b: DataFrame) = b
      .select(array_sort(col("docs")).as("_s"))
      .select(posexplode(col("_s")).as(Seq("_i", "l")), col("_s"))
      .select(col("l"),
        explode(slice(col("_s"), col("_i") + 2, size(col("_s")) - col("_i") - 1)).as("r"))
    time("pairs_explode")(pairsOf(buckets.where(size(col("docs")).between(2, 2000))))
    time("pairs_final_agg")(
      pairsOf(buckets.where(size(col("docs")).between(2, 2000)))
        .select(col("l.id").as("a"), col("r.id").as("b"),
          col("l.n_sh").as("na"), col("r.n_sh").as("nb"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("inter")))
    spark.stop()
  }
}
