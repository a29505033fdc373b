package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fused per-table statistics as ONE typed, mergeable `Aggregator`
  * (SURVEY.md §4.2 item 2): count, doc_id null count, n_tok min/max,
  * global token min/max, and a fixed-edge token-length histogram — all
  * accumulated in a single buffer per task and merged tree-style across
  * partitions (the treeAggregate shape of the north rule: each partial
  * is O(buckets) bytes regardless of row count, so the reduce is
  * metadata-sized at any scale).
  *
  * The reference analog is the one-pass accumulation of `validate`
  * (reference `src/Data/Aeson/Schema/Validator.hs:33-38` folds every
  * check over the value in one traversal); here the traversal is over
  * rows instead of a JSON tree. [[TableProfiler.profile]] is the
  * untyped/codegen'd variant; this Aggregator exists for callers that
  * want all stats in one buffer (single shuffle-free job, one reduce)
  * and as the §4.2 mergeable-partial design artifact.
  *
  * Registered for SQL via `udaf()` in [[StatsAggregator.register]].
  */
object StatsAggregator {

  /** Input row shape — matches the engine's primary input table. */
  final case class SeqRow(doc_id: Option[String], tokens: Option[Array[Int]],
      n_tok: Option[Int], source: Option[String])

  /** Mergeable buffer. Histogram buckets are `n_tok / bucketWidth`,
    * clamped to [0, nBuckets); nulls/absent arrays are counted, not
    * bucketed.
    */
  final case class StatsBuf(
      n: Long,
      docIdNulls: Long,
      tokensNulls: Long,
      nTokMin: Int, nTokMax: Int,
      tokMin: Int, tokMax: Int,
      hist: Array[Long])

  final case class StatsRow(
      n: Long,
      doc_id_nulls: Long,
      tokens_nulls: Long,
      n_tok_min: Option[Int], n_tok_max: Option[Int],
      token_min: Option[Int], token_max: Option[Int],
      hist: Seq[Long])

  final class SeqStats(bucketWidth: Int, nBuckets: Int)
      extends Aggregator[SeqRow, StatsBuf, StatsRow] {

    override def zero: StatsBuf =
      StatsBuf(0L, 0L, 0L, Int.MaxValue, Int.MinValue, Int.MaxValue,
        Int.MinValue, new Array[Long](nBuckets))

    override def reduce(b: StatsBuf, r: SeqRow): StatsBuf = {
      val docNull = if (r.doc_id.isEmpty) 1L else 0L
      var tokMin = b.tokMin; var tokMax = b.tokMax; var tokNull = b.tokensNulls
      r.tokens match {
        case Some(ts) =>
          var i = 0
          while (i < ts.length) {
            val t = ts(i)
            if (t < tokMin) tokMin = t
            if (t > tokMax) tokMax = t
            i += 1
          }
        case None => tokNull += 1L
      }
      var nTokMin = b.nTokMin; var nTokMax = b.nTokMax
      r.n_tok.foreach { nt =>
        if (nt < nTokMin) nTokMin = nt
        if (nt > nTokMax) nTokMax = nt
        val bkt = math.min(math.max(nt / bucketWidth, 0), nBuckets - 1)
        b.hist(bkt) += 1L // buffer array mutated in place (encoder copies per partial)
      }
      StatsBuf(b.n + 1L, b.docIdNulls + docNull, tokNull, nTokMin, nTokMax,
        tokMin, tokMax, b.hist)
    }

    override def merge(a: StatsBuf, c: StatsBuf): StatsBuf = {
      val hist = new Array[Long](nBuckets)
      var i = 0
      while (i < nBuckets) { hist(i) = a.hist(i) + c.hist(i); i += 1 }
      StatsBuf(a.n + c.n, a.docIdNulls + c.docIdNulls,
        a.tokensNulls + c.tokensNulls,
        math.min(a.nTokMin, c.nTokMin), math.max(a.nTokMax, c.nTokMax),
        math.min(a.tokMin, c.tokMin), math.max(a.tokMax, c.tokMax), hist)
    }

    override def finish(b: StatsBuf): StatsRow = {
      def opt(v: Int, sentinel: Int): Option[Int] = if (v == sentinel) None else Some(v)
      StatsRow(b.n, b.docIdNulls, b.tokensNulls,
        opt(b.nTokMin, Int.MaxValue), opt(b.nTokMax, Int.MinValue),
        opt(b.tokMin, Int.MaxValue), opt(b.tokMax, Int.MinValue),
        b.hist.toSeq)
    }

    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[StatsRow] = Encoders.product[StatsRow]
  }

  /** All stats of `df` in one pass / one buffer. `df` must carry the
    * primary input columns (`doc_id`, `tokens`, `n_tok`).
    */
  def profile(df: DataFrame, bucketWidth: Int = 32, nBuckets: Int = 16): DataFrame = {
    val agg = udaf(new SeqStats(bucketWidth, nBuckets))
    df.agg(agg(col("doc_id"), col("tokens"), col("n_tok"), col("source")).as("s"))
      .select(col("s.*"))
  }

  /** Register as the SQL function `seq_stats(struct(...))`. */
  def register(spark: org.apache.spark.sql.SparkSession,
      bucketWidth: Int = 32, nBuckets: Int = 16): Unit =
    spark.udf.register("seq_stats", udaf(new SeqStats(bucketWidth, nBuckets)))
}
