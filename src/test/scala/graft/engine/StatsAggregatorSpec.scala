package graft.engine

import graft.SparkSessionTestWrapper
import graft.gen.SequenceGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused typed Aggregator must agree with independently-computed
  * built-in aggregates on the same generated table, and its partials
  * must merge correctly (exercised by running over many partitions).
  */
class StatsAggregatorSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val df = SequenceGen.generate(spark, 6000).repartition(13).cache()

  test("one-pass aggregator matches built-in aggregates") {
    val got = StatsAggregator.profile(df, bucketWidth = 32, nBuckets = 16).collect()(0)

    val exp = df.agg(
      count(lit(1)).as("n"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("dn"),
      min("n_tok").as("nmin"), max("n_tok").as("nmax"),
      min(array_min(col("tokens"))).as("tmin"),
      max(array_max(col("tokens"))).as("tmax")).collect()(0)

    assert(got.getAs[Long]("n") == exp.getAs[Long]("n"))
    assert(got.getAs[Long]("doc_id_nulls") == exp.getAs[Long]("dn"))
    assert(got.getAs[Long]("tokens_nulls") == 0L) // generator never emits null arrays
    assert(got.getAs[Int]("n_tok_min") == exp.getAs[Int]("nmin"))
    assert(got.getAs[Int]("n_tok_max") == exp.getAs[Int]("nmax"))
    assert(got.getAs[Int]("token_min") == exp.getAs[Int]("tmin"))
    assert(got.getAs[Int]("token_max") == exp.getAs[Int]("tmax"))
  }

  test("histogram buckets match groupBy histogram and sum to row count") {
    val row = StatsAggregator.profile(df, bucketWidth = 32, nBuckets = 16).collect()(0)
    val got = row.getSeq[Long](row.fieldIndex("hist"))

    val exp = df.groupBy(least(greatest(col("n_tok") / 32, lit(0)), lit(15))
        .cast("int").as("b"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    (0 until 16).foreach { b =>
      assert(got(b) == exp.getOrElse(b, 0L), s"bucket $b")
    }
    assert(got.sum == df.count())
  }

  test("empty input yields zero counts and absent extrema") {
    val empty = df.where(lit(false))
    val got = StatsAggregator.profile(empty).collect()(0)
    assert(got.getAs[Long]("n") == 0L)
    assert(got.isNullAt(got.fieldIndex("n_tok_min")))
    assert(got.isNullAt(got.fieldIndex("token_max")))
  }

  test("SQL registration: seq_stats usable from spark.sql") {
    StatsAggregator.register(spark)
    df.createOrReplaceTempView("seqs")
    val r = spark.sql(
      "SELECT s.n, s.n_tok_max FROM (SELECT seq_stats(doc_id, tokens, n_tok, source) s FROM seqs)")
      .collect()(0)
    assert(r.getLong(0) == df.count())
  }

  test("exact grouped quantiles: interpolation definition; approx within tolerance") {
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val exact = TableProfiler.quantiles(df, Seq("source"), "n_tok", ps)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    // independent definition: sort values, interpolate at p*(n-1)
    val bySrc = df.select("source", "n_tok").collect()
      .groupBy(_.getString(0)).map { case (s, rows) =>
        val v = rows.map(_.getInt(1).toDouble).sorted
        s -> ps.map { p =>
          val idx = p * (v.length - 1)
          val (lo, hi) = (v(idx.floor.toInt), v(idx.ceil.toInt))
          val g = idx - idx.floor
          math.rint((lo * (1 - g) + hi * g) * 1e6) / 1e6
        }
      }
    bySrc.foreach { case (s, exp) =>
      assert(exact(s) == exp, s"exact quantiles for $s")
    }
    // sketch path: approx_percentile returns an OBSERVED element whose
    // rank is within n/accuracy of the target — assert rank-window
    // membership, not value distance (on sparse groups the nearest
    // element can be numerically far from the interpolated quantile)
    val approx = TableProfiler.approxQuantiles(df, Seq("source"), "n_tok", ps)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val sortedBySrc = df.select("source", "n_tok").collect()
      .groupBy(_.getString(0)).map { case (s, rows) =>
        s -> rows.map(_.getInt(1).toDouble).sorted
      }
    sortedBySrc.foreach { case (s, v) =>
      approx(s).zip(ps).foreach { case (a, p) =>
        val idx = p * (v.length - 1)
        val slack = math.max(1, v.length / 1000)
        val lo = v(math.max(0, idx.floor.toInt - slack))
        val hi = v(math.min(v.length - 1, idx.ceil.toInt + slack))
        assert(a >= lo && a <= hi, s"approx p$p for $s: $a outside rank window [$lo,$hi]")
      }
    }
  }
}
