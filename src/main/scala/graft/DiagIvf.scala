package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Where does ann_ivf_topk's wall time go? Splits the query into its
  * three driver-visible phases — centroid collect, plan+codegen (first
  * noop run of a FRESH plan), re-execution of the SAME plan object —
  * so fixed per-plan cost is separated from per-row cost.
  */
object DiagIvf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-ivf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diagivf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm the scan
    (1 to 3).foreach { rep =>
      val cents = t(s"rep$rep centroids collect") {
        Similarity.corpusCentroids(emb, "vec_id", "embedding", every = 61L)
      }
      val q = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val df = t(s"rep$rep build ivfTopK") {
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qvec", 3,
          cents, nprobe = 2)
      }
      t(s"rep$rep first noop run")(df.write.mode("overwrite").format("noop").save())
      t(s"rep$rep second run same plan")(df.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
