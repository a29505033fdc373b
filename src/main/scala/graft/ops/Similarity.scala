package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design: queries are broadcast (query sets are small); the corpus
  * is scanned once, never shuffled, and top-k is a per-query window over
  * the (|Q| × |corpus|) scored stream — with AQE and partial top-k
  * ranking this is scan-bound. The LSH variant prunes the corpus to one
  * bucket per query, trading recall for a |corpus|/2^bits scan.
  */
object Similarity {

  /** Dot product of two array<numeric> columns in double with
    * left-to-right summation (portable across engines).
    */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array<numeric> column. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two array<numeric> columns. On pair-join hot
    * paths, precompute [[norm]] per ROW before the join instead (see
    * [[bruteForceTopK]]) — this form recomputes both norms per pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for each query vector.
    * `queries(qKey, qVec)` is broadcast against `corpus(cKey, cVec)`;
    * self-matches (same key) are excluded. Norms are computed once per
    * corpus row / query row before the join, so each of the
    * |Q|×|corpus| scored pairs costs a single dot product.
    */
  def bruteForceTopK(corpus: DataFrame, cKey: String, cVec: String,
      queries: DataFrame, qKey: String, qVec: String, k: Int): DataFrame = {
    val c = corpus.withColumn("_cn", norm(col(cVec)))
    val q = queries.withColumn("_qn", norm(col(qVec)))
    val scored = c
      .join(broadcast(q), col(qKey) =!= col(cKey))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("_qn") * col("_cn")))
    val w = Window.partitionBy(col(qKey)).orderBy(col("cos").desc, col(cKey).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qKey).as("query_id"), col(cKey).as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: `bits` planes × `dim` components
    * in [-1, 1], from a fixed-seed LCG (shared with the oracle SQL,
    * which inlines the same values as literals).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      // top 53 bits → [0,1) → [-1,1)
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(bits, dim)(next())
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes:
    * bit j = 1 iff dot(v, plane_j) > 0. Pure expressions, no UDF.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(vec, typedlit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus bucketed by LSH: `(bucket, n)` histogram — the partition
    * balance diagnostic for the ANN index.
    */
  def lshBucketHistogram(corpus: DataFrame, vecCol: String,
      planes: Array[Array[Double]]): DataFrame =
    corpus.select(lshBucket(col(vecCol), planes).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Approximate top-k: like [[bruteForceTopK]] but each query only scans
    * its own LSH bucket (recall < 1, cost |corpus| / 2^bits per query).
    */
  def lshTopK(corpus: DataFrame, cKey: String, cVec: String,
      queries: DataFrame, qKey: String, qVec: String, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val cB = corpus.withColumn("bucket", lshBucket(col(cVec), planes))
      .withColumn("_cn", norm(col(cVec)))
    val qB = queries.withColumn("bucket", lshBucket(col(qVec), planes))
      .withColumn("_qn", norm(col(qVec)))
    val scored = cB
      .join(broadcast(qB), Seq("bucket"))
      .where(col(qKey) =!= col(cKey))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("_qn") * col("_cn")))
    val w = Window.partitionBy(col(qKey)).orderBy(col("cos").desc, col(cKey).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qKey).as("query_id"), col(cKey).as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"))
  }
}
