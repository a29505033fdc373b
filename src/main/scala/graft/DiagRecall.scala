package graft

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured recall@k of the approximate ANN paths (IVF / PQ / IVF+PQ)
  * against exact brute force at REALISTIC settings — the tuning evidence
  * production deployments need (exactness is proven in OpsSpec only at
  * degenerate settings: all probes / every-vector codebooks). Prints a
  * markdown table; the ANN-recall section of BENCH/BASELINE.md is this
  * main's verbatim output, never hand-entered.
  *
  * Usage: DiagRecall [sfDir] [nQueries] [k] [every]
  */
object DiagRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nQ = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 10
    val every = if (args.length > 3) args(3).toLong else 61L
    val spark = SparkSession.builder().master("local[32]")
      .appName("diag-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val q = emb.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = Similarity.corpusCentroids(emb, "vec_id", "embedding", every)
    val cb = cents.map(_._2)
    val nSub = 8

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (qid, rows) =>
          qid -> rows.map(_.getLong(1)).toSet
        }

    val truth = topSets(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qvec", k))

    def recall(ann: DataFrame): Double = {
      val got = topSets(ann)
      val per = truth.map { case (qid, t) =>
        got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    println(s"[recall] corpus=$nVec vectors (64-dim), queries=$nQ, k=$k, " +
      s"centroids/codewords=${cents.length} (every=$every), pq nSub=$nSub " +
      s"(8 bytes/vector vs 512 raw)")
    println("| Path | Setting | recall@" + k + " |")
    println("| --- | --- | --- |")
    for (nprobe <- Seq(1, 2, 4, 8, 16, cents.length)) {
      val r = recall(Similarity.ivfTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k, cents, nprobe))
      val frac = f"scans ~${100.0 * nprobe / cents.length}%.0f%% of cells"
      println(f"| IVF | nprobe=$nprobe%2d/${cents.length} ($frac) | $r%.3f |")
    }
    val rPq = recall(Similarity.pqTopK(emb, "vec_id", "embedding",
      q, "qid", "qvec", k, cb, nSub))
    println(f"| PQ | ${cb.length} codewords x $nSub subspaces | $rPq%.3f |")
    for (nprobe <- Seq(2, 4, 8)) {
      val r = recall(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k, cents, nprobe, cb, nSub))
      println(f"| IVF+PQ | nprobe=$nprobe%2d/${cents.length}, ${cb.length} codewords | $r%.3f |")
    }
    spark.stop()
  }
}
